"""Unigram-LM tokenizer training (Kudo 2018, arXiv:1804.10959 — the
SentencePiece unigram model), in the distributed shape that scales to a
100 TB corpus:

1. The corpus collapses ONCE to distinct-word frequencies (the only pass
   over raw text) — every EM iteration then runs on the vocabulary-sized
   frame, independent of corpus size. Same contract as ``bpe.bpe_train``.
2. Candidate pieces are every substring up to ``max_piece_len`` of every
   distinct word, enumerated with builtin array expressions (flatten of a
   nested ``transform``/``sequence`` — no Python in the enumeration) and
   weighted by word frequency; the seed vocabulary is all single
   characters (coverage guarantee) plus the top multi-char candidates.
3. Each EM round segments every distinct word with Viterbi under the
   current piece log-probabilities (an Arrow-batched ``mapInPandas`` over
   the word frame; the piece table rides along as a broadcast dict),
   re-counts piece usage with a builtin explode→groupBy, and renormalizes.
   Per-round driver traffic is ≤ |vocab| rows — bounded by construction,
   never corpus-sized.
4. Viterbi ties break deterministically (fewer pieces, then the
   lexicographically-smallest segmentation), so the trained vocabulary is
   identical across runs and cluster layouts.

Iterative float recurrence ⇒ no SQL oracle (same standing as BPE/q149);
behavior is pinned by construction tests in tests/test_wave12.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def _viterbi_fn(piece_logp: dict[str, float], max_piece_len: int):
    """Best segmentation of each word under the current unigram LM.

    dp[j] = best (logp, -n_pieces, pieces_tuple) over i<j with s[i:j] in
    vocab; the tuple comparison implements the deterministic tie-break."""

    def apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            segs = []
            for w in pdf["word"]:
                n = len(w)
                NEG = float("-inf")
                # (score, neg_pieces, seg) per prefix length
                dp: list[tuple[float, int, tuple[str, ...]]] = [
                    (NEG, 0, ()) for _ in range(n + 1)
                ]
                dp[0] = (0.0, 0, ())
                for j in range(1, n + 1):
                    best = (NEG, 0, ())
                    for i in range(max(0, j - max_piece_len), j):
                        if dp[i][0] == NEG:
                            continue
                        piece = w[i:j]
                        lp = piece_logp.get(piece)
                        if lp is None:
                            continue
                        cand = (
                            dp[i][0] + lp,
                            dp[i][1] - 1,
                            dp[i][2] + (piece,),
                        )
                        if cand > best:
                            best = cand
                    dp[j] = best
                segs.append(list(dp[n][2]))
            out = pdf.copy()
            out["pieces"] = segs
            yield out

    return apply


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 64,
    max_piece_len: int = 4,
    iterations: int = 3,
) -> DataFrame:
    """Train a unigram-LM tokenizer; returns (piece, count, logprob) for
    the final vocabulary, logprob rounded to 6 dp (float-path convention).

    ``vocab_size`` bounds the MULTI-char piece count; single characters are
    always kept so every word stays segmentable (Kudo's coverage rule)."""
    spark = df.sparkSession
    words = (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    words.persist()
    # --- candidate enumeration: substrings via nested array expressions ---
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(
                        F.lit(max_piece_len), F.length("word") - i + 1
                    ),
                ),
                lambda ln: F.substring(F.col("word"), i, ln),
            ),
        )
    )
    cand = (
        words.select(F.explode(subs).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )
    chars = cand.filter(F.length("piece") == 1)
    multi = (
        cand.filter(F.length("piece") > 1)
        .orderBy(F.col("cnt").desc(), "piece")
        .limit(vocab_size)
    )
    seed = chars.unionByName(multi).collect()  # ≤ |charset| + vocab_size rows
    import math

    if not seed:
        # empty corpus: no vocabulary to learn (empty-in/empty-out; the
        # per-round floor-probability division would hit 0/0 otherwise)
        words.unpersist()
        return words.sparkSession.createDataFrame(
            [], "piece string, count long, logprob double"
        )
    total = sum(r.cnt for r in seed)
    logp = {r.piece: math.log(r.cnt / total) for r in seed}

    out_schema = "word string, freq long, pieces array<string>"
    segmented = None
    for _ in range(iterations):
        segmented = words.mapInPandas(
            _viterbi_fn(logp, max_piece_len), schema=out_schema
        )
        counts = (
            segmented.select(F.explode("pieces").alias("piece"), "freq")
            .groupBy("piece")
            .agg(F.sum("freq").alias("cnt"))
            .collect()  # ≤ |vocab| rows — the bounded per-round transfer
        )
        used_total = sum(r.cnt for r in counts)
        used = {r.piece: math.log(r.cnt / used_total) for r in counts}
        # unused pieces are pruned; single chars stay with a floor prob so
        # coverage never breaks (Kudo's smoothing for the char fallback)
        floor = math.log(0.5 / used_total)
        logp = {
            p: used.get(p, floor)
            for p in logp
            if p in used or len(p) == 1
        }
    final = (
        segmented.select(F.explode("pieces").alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("count"))
    )
    words.unpersist()
    tot = final.agg(F.sum("count").alias("t"))
    return final.join(F.broadcast(tot)).select(
        "piece",
        "count",
        F.round(F.log(F.col("count") / F.col("t").cast("double")), 6).alias(
            "logprob"
        ),
    )

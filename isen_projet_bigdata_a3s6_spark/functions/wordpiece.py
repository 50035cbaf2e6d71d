"""WordPiece encoding (Wu et al. 2016, arXiv:1609.08144 — the BERT
tokenizer family): greedy longest-match-first segmentation with ``##``
continuation pieces and an ``[UNK]`` fallback.

Completes the tokenizer triad next to BPE (functions/bpe.py — merge-rule
replay) and Unigram-LM (functions/unigram.py — Viterbi): three encoders,
three different inference rules, one shared corpus→word-frequency shape.

The subword vocabulary here derives deterministically from BPE merges
(``vocab_from_bpe``): every merged unit contributes its word-initial form
and its ``##`` continuation form, plus all single characters as the base
alphabet. That mirrors how practitioners bootstrap WordPiece vocabs and
keeps training corpus-sized-once (BPE's property), while the ENCODER is
the genuine WordPiece greedy algorithm — which is not merge replay: it
needs only the vocab SET, not rule order.

Scale shape: the vocab is tiny (≤ alphabet + 2·merges) and ships in the
UDF closure (a broadcast at scale); encoding is a pure Arrow-batched map
with a per-batch word→pieces memo — no shuffle, no per-row Python calls
into the JVM.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import EOW, _local_java_ws_tokens


def vocab_from_bpe(rules: list[tuple]) -> set[str]:
    """Deterministic WordPiece vocab from learned BPE merges: each merged
    unit (end-of-word marker stripped) yields an initial and a ``##``
    continuation piece."""
    vocab: set[str] = set()
    for r in rules:
        unit = (r[0] + r[1]).replace(EOW, "")
        if unit:
            vocab.add(unit)
            vocab.add("##" + unit)
    return vocab


def encode_word(word: str, vocab: set[str], max_len: int = 100) -> list[str]:
    """Greedy longest-match-first WordPiece segmentation of one word.

    Single characters always match (the base alphabet is implicitly in
    the vocab — the standard 'alphabet completeness' convention), so the
    only [UNK] case is an over-long word.
    """
    if len(word) > max_len:
        return ["[UNK]"]
    pieces: list[str] = []
    start = 0
    while start < len(word):
        end = len(word)
        cur = None
        while start < end:
            sub = word[start:end]
            if start > 0:
                sub = "##" + sub
            if sub in vocab or end - start == 1:
                cur = sub
                break
            end -= 1
        pieces.append(cur)
        start = end
    return pieces


def wordpiece_stats(
    df: DataFrame,
    text_col: str,
    vocab: set[str],
    id_col: str = "doc_id",
    max_len: int = 100,
) -> DataFrame:
    """Per-document WordPiece accounting: word count, piece count, and
    count of multi-piece (split) words — the fertility inputs. Pure
    Arrow-batched map; vocab travels in the closure. The greedy matcher is
    re-stated as a LOCAL closure (not a call to module-level
    :func:`encode_word`) so cloudpickle ships it by value — workers must
    not need this package importable (the q45/bpe convention; a bare
    driver session outside the repo would otherwise fail with
    ModuleNotFoundError in the executor).

    ``max_len`` is the [UNK] cutoff AND the SQL oracle's unroll bound
    (each greedy step consumes >= 1 char, so a word of length <= max_len
    finishes within max_len rounds) — q237 passes 32 so the replay stays
    compact; parity is unconditional because BOTH engines [UNK] anything
    longer."""
    frozen = frozenset(vocab)

    def _encode(word: str) -> list[str]:
        # keep in sync with encode_word (pinned by tests against it)
        if len(word) > max_len:
            return ["[UNK]"]
        pieces: list[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in frozen or end - start == 1:
                    cur = sub
                    break
                end -= 1
            pieces.append(cur)
            start = end
        return pieces

    # captured by value — a module-level java_ws_tokens reference would
    # pickle by reference and need the package importable on workers
    tok = _local_java_ws_tokens()

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, tuple[int, int]] = {}
        for pdf in batches:
            ids, n_words, n_pieces, n_split = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                # Java \s class, matching the Spark-SQL train path and the
                # oracle convention — NOT str.split()'s Unicode whitespace
                # (r09 advisory; see bpe.java_ws_tokens)
                words = tok(text)
                tw = tp = ts = 0
                for w in words:
                    hit = memo.get(w)
                    if hit is None:
                        p = _encode(w)
                        hit = (len(p), 1 if len(p) > 1 else 0)
                        memo[w] = hit
                    tw += 1
                    tp += hit[0]
                    ts += hit[1]
                ids.append(did)
                n_words.append(tw)
                n_pieces.append(tp)
                n_split.append(ts)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_words": n_words,
                    "n_pieces": n_pieces,
                    "n_split_words": n_split,
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        per_batch,
        f"{id_col} long, n_words long, n_pieces long, n_split_words long",
    )

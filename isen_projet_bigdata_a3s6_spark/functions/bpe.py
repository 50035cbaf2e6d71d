"""Distributed BPE (byte-pair encoding) tokenizer training — the merge-rule
learner of Sennrich et al. 2016 (arXiv:1508.07909), in the shape that
scales to a 100 TB corpus:

1. The corpus collapses ONCE to word frequencies (the only pass that
   touches raw text) — every later iteration runs on the vocabulary-sized
   frame, independent of corpus size.
2. Each merge iteration counts adjacent symbol pairs with a builtin
   explode→groupBy (codegen'd, weighted by word frequency), takes the
   argmax pair (deterministic tie-break: freq desc, then pair
   lexicographic), and applies the merge with a vectorized
   ``mapInPandas`` over the vocabulary frame.
3. Lineage is cut per round via the shared checkpoint helper, so N merges
   don't stack N plans.

Words carry the classic end-of-word marker ``</w>`` so merges distinguish
word-final from word-internal pairs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpointing import cut_lineage
from .text import tokens

EOW = "</w>"


def _merge_pair_fn(a: str, b: str):
    merged = a + b

    def apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_syms = []
            for syms in pdf["syms"]:
                s = list(syms)
                res = []
                i = 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        res.append(merged)
                        i += 2
                    else:
                        res.append(s[i])
                        i += 1
                out_syms.append(res)
            pdf = pdf.copy()
            pdf["syms"] = out_syms
            yield pdf

    return apply


def bpe_train(
    df: DataFrame,
    text_col: str,
    num_merges: int = 10,
    reliable: bool | None = None,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` merge rules; returns [(left, right, freq), ...]
    in learned order. Stops early if no pair occurs twice."""
    if num_merges < 1:
        raise ValueError("bpe_train: num_merges must be >= 1")
    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # word -> symbol sequence: chars + end-of-word marker
    state = words.select(
        "freq",
        F.concat(
            F.transform(
                F.sequence(F.lit(1), F.length("w")),
                lambda i: F.substring(F.col("w"), i, F.lit(1)),
            ),
            F.array(F.lit(EOW)),
        ).alias("syms"),
    )
    state = cut_lineage(state, reliable=reliable)

    rules: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pairs = (
            state.select(
                "freq",
                F.explode(
                    F.transform(
                        F.slice("syms", 1, F.size("syms") - 1),
                        lambda s, i: F.struct(
                            s.alias("a"), F.element_at("syms", i + 2).alias("b")
                        ),
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pairs.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not top or top[0]["cnt"] < 2:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        rules.append((a, b, cnt))
        state = state.mapInPandas(
            _merge_pair_fn(a, b), "freq long, syms array<string>"
        )
        state = cut_lineage(state, reliable=reliable)
    return rules

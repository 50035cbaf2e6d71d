"""Sequence packing for LLM pre-training data (BASELINE.json north_star):
turn a corpus of variable-length documents into fixed-token-budget training
sequences.

Two standard disciplines, both deterministic:

- :func:`concat_chunk_packing` — the GPT-style "concatenate then slice"
  layout: documents are laid end-to-end in a stable order and the stream is
  cut every ``budget`` tokens, so documents may SPAN pack boundaries. Pure
  window-cumsum arithmetic (exact SQL twin exists — oracle-checked).
- :func:`greedy_pack` — no-split bin packing: each document lands wholly in
  one pack; a pack is closed when the next document would overflow the
  budget. The greedy scan is inherently sequential, so it runs per hash
  bucket (the way real training pipelines shard packing across workers)
  inside an Arrow-batched ``applyInPandas``.

At 100 TB: both operators shuffle once on the packing-group key (source /
bucket). Nothing is collected to the driver; the greedy scan touches each
bucket's rows once in doc-id order. Group sizes are corpus/|buckets| — pick
``num_buckets`` ≥ cluster cores so no single bucket dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import token_count


def concat_chunk_packing(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int,
    group_col: str | None = None,
) -> DataFrame:
    """Concat-then-chunk packing layout: within each ``group_col`` stream
    (e.g. source/domain — the natural training-shard key), documents are
    concatenated in ``id_col`` order and sliced every ``budget`` tokens.

    Returns one row per document: ``(id, group, n_tokens, tok_offset,
    pack_start, pack_end)`` where ``tok_offset`` is the document's first
    token position in its stream and ``pack_start``/``pack_end`` are the
    first/last pack indices the document occupies (equal unless the
    document spans a boundary). Empty documents occupy no tokens and sit
    wholly in the pack at their offset.

    One shuffle (window over the group key); every expression is builtin
    and stays in codegen.
    """
    if budget <= 0:
        raise ValueError("concat_chunk_packing: budget must be positive")
    gcol = group_col
    parts = [gcol] if gcol else []
    w = W.partitionBy(*parts).orderBy(F.asc(id_col)) if parts else W.orderBy(
        F.asc(id_col)
    )
    n = token_count(text_col)
    out = df.select(
        F.col(id_col),
        *([F.col(gcol)] if gcol else []),
        n.cast("long").alias("n_tokens"),
    ).withColumn(
        "tok_offset",
        F.coalesce(
            F.sum("n_tokens").over(w.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("long"),
    )
    return out.select(
        id_col,
        *([gcol] if gcol else []),
        "n_tokens",
        "tok_offset",
        F.floor(F.col("tok_offset") / budget).alias("pack_start"),
        F.floor(
            (
                F.col("tok_offset")
                + F.greatest(F.col("n_tokens") - 1, F.lit(0))
            )
            / budget
        ).alias("pack_end"),
    )


def greedy_pack(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int,
    num_buckets: int = 32,
) -> DataFrame:
    """No-split greedy bin packing: documents are sharded into
    ``num_buckets`` hash buckets; within a bucket, scanning in ``id_col``
    order, a document joins the current pack unless it would overflow
    ``budget``, in which case a new pack opens. A document alone larger
    than the budget gets its own (oversized) pack — real pipelines then
    truncate or chunk it downstream.

    Returns ``(id, bucket, n_tokens, pack_id)`` with ``pack_id`` counting
    from 0 within each bucket. The sequential scan is per-bucket inside an
    Arrow-batched ``applyInPandas`` — the only Python loop is over one
    bucket's rows, and buckets are processed in parallel across the
    cluster (the same worker-sharded packing every training-data pipeline
    uses; a globally-sequential greedy pack would serialize the corpus).
    """
    if budget <= 0:
        raise ValueError("greedy_pack: budget must be positive")
    # md5-derived bucket (not xxhash64) so the DuckDB oracle can replay
    # the sharding — the bucket function is an arbitrary worker-sharding
    # choice, and md5 is the one hash both engines compute identically
    # (the q224 seed precedent)
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10
        ).cast("long"),
        F.lit(num_buckets),
    )
    base = df.select(
        F.col(id_col).alias("id"),
        bucket.cast("int").alias("bucket"),
        token_count(text_col).cast("long").alias("n_tokens"),
    )

    # the id keeps the CALLER's type (string uuids, ints, ...) — only the
    # derived columns have fixed types
    schema = T.StructType(
        [
            T.StructField("id", df.schema[id_col].dataType),
            T.StructField("bucket", T.IntegerType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("pack_id", T.LongType()),
        ]
    )

    def pack(pdf):
        pdf = pdf.sort_values("id").reset_index(drop=True)
        pack_ids = []
        cur_pack, cur_fill = 0, 0
        for n in pdf["n_tokens"]:
            if cur_fill > 0 and cur_fill + n > budget:
                cur_pack += 1
                cur_fill = 0
            pack_ids.append(cur_pack)
            cur_fill += n
        pdf["pack_id"] = pack_ids
        return pdf

    return base.groupBy("bucket").applyInPandas(pack, schema=schema)

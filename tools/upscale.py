"""Upscale the sf0.1 testdata to an sf1-equivalent fixture for scale probing.

The driver ships sf{0.001,0.01,0.1}; between the two probe-usable points the
per-query times at the SMALL side are dominated by fixed job overhead
(~0.15-0.5 s on local[32]), so observed time ratios understate growth (see
tools/scale_probe.py). This tool manufactures the missing LARGE point: each
table is replicated K times (default 10) into DISJOINT shards so every
headline query runs at 10x sf0.1 with both measurement points well above the
overhead floor.

Shard construction (copy i of K):
- Entity keys get `+ i * STRIDE` (STRIDE = 2^40, far above any sf0.1 key),
  applied CONSISTENTLY on both sides of every join edge: custkey
  (customer/orders), orderkey (orders/lineitem), suppkey (supplier/lineitem),
  partkey (part/lineitem), user_id/event_id (events), doc_id/vec_id
  (documents/embeddings, which join in q219). Joins therefore match exactly
  within a copy and never across copies — cardinalities, fan-outs, and group
  sizes scale the way a 10x-bigger tenant population would.
- `region`/`nation` are fixed-cardinality dimensions at EVERY real SF (5/25
  rows at sf0.001 and sf0.1 alike); they are copied once, not replicated, and
  nationkey/regionkey references are left untouched.
- `documents.text` gets a per-copy letter ROTATION (a->b->c... by i, case
  preserved, digits/punct/whitespace untouched) so the similarity family
  (exact dedup, MinHash, SSJoin, winnowing, chunk dedup) sees 10 disjoint
  corpora with identical length/token/shingle-count statistics instead of
  every document acquiring 9 verbatim clones — verbatim replication would
  measure an O(K^2) cross-copy pair explosion that is an artifact of the
  fixture, not of the operators. Copy 0 is the identity rotation, so the
  original corpus is a subset. lang/source/n_chars are kept (n_chars is
  length-exact since rotation preserves length).
- `embeddings.label` gets `+ i * 1000`: cluster count grows with the data and
  cluster SIZE stays constant, which is the published SemDeDup operating
  regime (k chosen proportional to corpus size) and the honest scale model
  for q218's per-cluster quadratic stage. Vectors are kept bit-identical.

Everything is JVM-side column algebra on a `posexplode` of a K-element array
(one shuffle-free scan per table); output is snappy parquet in partitions
sized like the source.

Usage: python tools/upscale.py [K] [src_sf_dir] [dst_dir]
       (defaults: 10  /root/testdata/sf0.1  /tmp/a3s6_scale/sf1)
The dst dir name must end in `sf<factor>` so bench.py parses the sf field.
"""

from __future__ import annotations

import os
import shutil
import string
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from isen_projet_bigdata_a3s6_spark.session import get_spark  # noqa: E402

STRIDE = 1 << 40

# key columns offset by copy * STRIDE, per table (join-edge consistent)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED_DIMS = ["region", "nation"]


def rotated_alphabet(i: int) -> tuple[str, str]:
    low = string.ascii_lowercase
    up = string.ascii_uppercase
    rot = i % 26
    return low + up, low[rot:] + low[:rot] + up[rot:] + up[:rot]


def upscale(k: int, src: str, dst: str) -> None:
    spark = get_spark(app_name="upscale")
    os.makedirs(dst, exist_ok=True)
    for tbl in FIXED_DIMS:
        # fixed-cardinality dims: 1:1 copy (parquet bytes, no session needed)
        shutil.copyfile(f"{src}/{tbl}.parquet", f"{dst}/{tbl}.parquet")
        print(f"{tbl}: copied (fixed dim)", file=sys.stderr)
    copies = F.array(*[F.lit(i) for i in range(k)])
    for tbl, keys in KEYED.items():
        df = spark.read.parquet(f"{src}/{tbl}.parquet")
        n_in = df.count()
        out = df.select("*", F.explode(copies).alias("_copy"))
        for col in keys:
            dt = dict(df.dtypes)[col]
            out = out.withColumn(
                col, (F.col(col) + F.col("_copy").cast("long") * F.lit(STRIDE)).cast(dt)
            )
        if tbl == "documents":
            # per-copy letter rotation: 26 branches of F.translate, resolved
            # by the _copy column — stays inside whole-stage codegen
            src_a, _ = rotated_alphabet(0)
            expr = F.col("text")
            for i in range(1, min(k, 26)):
                _, dst_a = rotated_alphabet(i)
                expr = F.when(
                    F.col("_copy") % 26 == i, F.translate(F.col("text"), src_a, dst_a)
                ).otherwise(expr)
            out = out.withColumn("text", expr)
        if tbl == "embeddings":
            out = out.withColumn(
                "label", (F.col("label") + F.col("_copy") * F.lit(1000)).cast("int")
            )
        out = out.drop("_copy").select(*df.columns)  # original column order
        # ~500k rows per output file: same order of magnitude as the driver's
        # own per-sf file sizing, so scan parallelism scales with the data
        n_parts = max(k, (n_in * k) // 500_000 + 1)
        out.repartition(n_parts).write.mode("overwrite").parquet(f"{dst}/{tbl}.parquet")
        print(f"{tbl}: {n_in} -> {n_in * k} rows", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/a3s6_scale/sf1"
    upscale(k, src, dst)

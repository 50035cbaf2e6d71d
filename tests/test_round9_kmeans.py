"""Round-9 wave-3 promotion pins: deterministic Lloyd KMeans (q69/q70/q207),
the Knuth-hash split (q80), and the quantized Bradley-Terry loop (q274).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from isen_projet_bigdata_a3s6_spark.ml.kmeans import (
    kmeans_lloyd,
    kmeans_lloyd_ctes,
)

SF = "/root/testdata/sf0.001"


def test_lloyd_deterministic_across_runs(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    _, c1 = kmeans_lloyd(e, "embedding", "vec_id", k=3, iters=5)
    _, c2 = kmeans_lloyd(e, "embedding", "vec_id", k=3, iters=5)
    assert c1 == c2  # bit-identical centroids, not merely close


def test_lloyd_centroids_match_duckdb_bitwise(spark):
    """The correctness core of the q69/q70/q207 oracles: the Spark Lloyd
    and the generated DuckDB chain produce BIT-IDENTICAL centroids."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    _, cents = kmeans_lloyd(e, "embedding", "vec_id", k=3, iters=4)
    ctes, cent, _ = kmeans_lloyd_ctes(
        f"read_parquet('{SF}/embeddings.parquet')", "vec_id", "embedding",
        k=3, iters=4,
    )
    sql = "WITH " + ",\n ".join(ctes) + f"\n SELECT cell, c FROM {cent} ORDER BY cell"
    rows = duckdb.sql(sql).fetchall()
    assert len(rows) == 3
    for cell, c in rows:
        assert list(c) == cents[cell], f"cell {cell} differs"


def test_lloyd_inertia_comparable_to_spark_ml(spark):
    """Quality sanity vs the k-means|| production init: the lowest-id-init
    fixed-round Lloyd must land within 2x of Spark ML's inertia (it is a
    verifiability trade, not a broken clustering)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    assigned, cents = kmeans_lloyd(e, "embedding", "vec_id", k=3, iters=10)

    def inertia_of(assigned_df, cents_list):
        from isen_projet_bigdata_a3s6_spark.ml.kmeans import _sqdist_to_literal

        d = F.array(*[_sqdist_to_literal("embedding", c) for c in cents_list])
        return assigned_df.agg(F.sum(F.array_min(d))).collect()[0][0]

    mine = inertia_of(assigned, cents)
    vecs = e.select(
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
        "embedding",
    )
    model = KMeans(k=3, seed=42, maxIter=10).fit(vecs)
    ml_cents = [[float(x) for x in c] for c in model.clusterCenters()]
    theirs = inertia_of(vecs, ml_cents)
    assert mine <= 2.0 * theirs, (mine, theirs)


def test_lloyd_empty_in_none(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet").filter(F.lit(False))
    assert kmeans_lloyd(e, "embedding", "vec_id", k=3) is None


def test_knuth_split_disjoint_and_replayable(spark):
    from isen_projet_bigdata_a3s6_spark.ml.evaluation import (
        knuth_split,
        knuth_split_sql,
    )

    o = spark.read.parquet(f"{SF}/orders.parquet")
    train, test = knuth_split(o, "o_orderkey", 0.2)
    n, ntr, nte = o.count(), train.count(), test.count()
    assert ntr + nte == n and nte > 0 and ntr > 0
    # DuckDB replays the identical membership
    tr_w, te_w = knuth_split_sql("o_orderkey", 0.2)
    d_te = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/orders.parquet') WHERE {te_w}"
    ).fetchone()[0]
    assert d_te == nte
    spark_te_ids = {r[0] for r in test.select("o_orderkey").collect()}
    duck_te_ids = {
        r[0]
        for r in duckdb.sql(
            f"SELECT o_orderkey FROM read_parquet('{SF}/orders.parquet') WHERE {te_w}"
        ).fetchall()
    }
    assert spark_te_ids == duck_te_ids


def test_q274_quantized_scores_still_match_float_mm(spark):
    """The per-round round8 quantization must not move scores beyond the
    1e-4 parity the original pinned test asserts: compare the registered
    query's output against an UNQUANTIZED float MM on the same matrix."""
    import numpy as np

    from isen_projet_bigdata_a3s6_spark import queries as Q

    rows = Q._QUERIES["q274_bradley_terry"](spark, SF).collect()
    scores = {r["supplier"]: r["bt_score"] for r in rows}
    if not scores:
        pytest.skip("no matches at this SF")
    # rebuild the same exact win matrix directly
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    unit = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("decimal(18,4)").alias("se"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("decimal(18,4)").alias("sq"),
    )
    u2 = unit.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("s2"),
        F.col("se").alias("se2"), F.col("sq").alias("sq2"))
    m = (
        unit.withColumnRenamed("l_partkey", "pk").withColumnRenamed("l_suppkey", "s1")
        .withColumnRenamed("se", "se1").withColumnRenamed("sq", "sq1")
        .join(u2, "pk").where(F.col("s1") < F.col("s2"))
        .where(F.col("se1") * F.col("sq2") != F.col("se2") * F.col("sq1"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.when(F.col("se1") * F.col("sq2") < F.col("se2") * F.col("sq1"), 1).otherwise(0)).alias("w1"))
    ).collect()
    players = sorted({r["s1"] for r in m} | {r["s2"] for r in m})
    idx = {s: i for i, s in enumerate(players)}
    k = len(players)
    w = np.zeros(k); g = np.zeros(k)
    for r in m:
        w[idx[r["s1"]]] += r["w1"]; w[idx[r["s2"]]] += r["n"] - r["w1"]
        g[idx[r["s1"]]] += r["n"]; g[idx[r["s2"]]] += r["n"]
    p = np.ones(k)
    for _ in range(100):
        denom = np.zeros(k)
        for r in m:
            c = r["n"] / (p[idx[r["s1"]]] + p[idx[r["s2"]]])
            denom[idx[r["s1"]]] += c; denom[idx[r["s2"]]] += c
        newp = np.where(denom > 0, w / np.where(denom > 0, denom, 1.0), p)
        p = newp * (k / newp.sum())  # NO quantization in the reference loop
    for s in players:
        assert abs(scores[s] - p[idx[s]]) < 1e-4, s

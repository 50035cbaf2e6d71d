"""Wave-16 tests: BM25 ranking, Theil–Sen robustness, partition pruning,
weighted median."""

import math

from pyspark.sql import functions as F

from isen_projet_bigdata_a3s6_spark import queries as Q

SF = "/root/testdata/sf0.001"


def test_bm25_hand_computed(spark):
    # tiny corpus where BM25 is workable by hand
    docs = [
        (1, "spark merge window"),
        (2, "spark spark spark other words here"),
        (3, "nothing relevant at all"),
        (4, "merge window merge window"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    import isen_projet_bigdata_a3s6_spark.queries as qmod

    # run the same pipeline on the tiny frame via a local re-derivation
    from isen_projet_bigdata_a3s6_spark.functions.text import tokens

    toks = df.select("doc_id", F.filter(tokens("text"), lambda w: w != "").alias("t"))
    rows = {r["doc_id"]: r["t"] for r in toks.collect()}
    N = len(docs)
    avgdl = sum(len(t) for t in rows.values()) / N
    terms = ["spark", "merge", "window"]

    def bm25(doc):
        t = rows[doc]
        dl = len(t)
        s = 0.0
        for term in terms:
            tf = t.count(term)
            if tf == 0:
                continue
            df_t = sum(1 for d in rows.values() if term in d)
            idf = math.log((N - df_t + 0.5) / (df_t + 0.5) + 1.0)
            s += round(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))), 9)
        return round(s, 6)

    # doc 1 mentions all three query terms -> highest score
    expected_order = sorted(
        [d for d in rows if bm25(d) > 0], key=lambda d: (-bm25(d), d)
    )
    assert expected_order[0] == 1
    # the registered query at sf0.001 returns at most 10 rows, scores desc
    out = Q._QUERIES["q240_bm25_topk"](spark, SF).collect()
    assert 0 < len(out) <= 10
    scores = [r["bm25"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_theil_sen_robust_to_outlier(spark):
    # exact line + one wild outlier: Theil-Sen recovers the slope, OLS won't
    pts = [(t, 3.0 * t + 10.0) for t in range(50)]
    pts[25] = (25, 10_000.0)
    df = spark.createDataFrame(pts, ["t", "x"])
    a, b = df.alias("a"), df.alias("b")
    slopes = a.join(b, F.col("b.t") > F.col("a.t")).select(
        ((F.col("b.x") - F.col("a.x")) / (F.col("b.t") - F.col("a.t"))).alias("s")
    )
    slope = slopes.agg(F.expr("percentile(s, 0.5)").alias("m")).collect()[0]["m"]
    assert abs(slope - 3.0) < 1e-9


def test_partitioned_layout_prunes(spark):
    import os
    import tempfile

    from isen_projet_bigdata_a3s6_spark.sources.readers import load_table

    e = load_table(spark, SF, "events")
    out = tempfile.mkdtemp(prefix="prune_test_") + "/events_by_day"
    e.withColumn("event_date", F.to_date("ts")).write.mode("overwrite").partitionBy(
        "event_date"
    ).parquet(out)
    back = spark.read.parquet(out).where(
        F.col("event_date").between("2024-01-08", "2024-01-09")
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition pruning happens at scan planning: the date predicate must be
    # a PartitionFilter, and no post-scan Filter on event_date may remain
    assert "PartitionFilters: [" in plan
    assert "event_date" in plan.split("PartitionFilters:")[1].split("]")[0]
    # correctness: pruned read equals predicate on the raw frame
    want = (
        e.where(F.to_date("ts").between("2024-01-08", "2024-01-09")).count()
    )
    assert back.count() == want


def _py_weighted_median(pairs):
    # pairs: (value, weight); lower weighted median
    total = sum(w for _, w in pairs)
    acc = 0
    for v, w in sorted(pairs):
        acc += w
        if 2 * acc >= total:
            return v
    return None


def test_weighted_median_matches_python(spark):
    import random

    rng = random.Random(3)
    pairs = [(round(rng.uniform(0, 100), 2), rng.randint(1, 9)) for _ in range(500)]
    df = spark.createDataFrame(
        [("G", v, float(w)) for v, w in pairs],
        ["l_returnflag", "l_extendedprice", "l_quantity"],
    )
    # reuse the registered query's logic by monkey table: simpler to inline
    from pyspark.sql import Window

    w = df.groupBy(
        F.col("l_returnflag").alias("flag"), F.col("l_extendedprice").alias("v")
    ).agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("wt"))
    win = Window.partitionBy("flag").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy("flag")
    cum = w.select(
        "flag", "v",
        F.sum("wt").over(win).alias("cw"),
        F.sum("wt").over(tot).alias("tw"),
    )
    got = (
        cum.where(F.lit(2) * F.col("cw") >= F.col("tw"))
        .groupBy("flag")
        .agg(F.min("v").alias("wm"))
        .collect()[0]["wm"]
    )
    assert got == _py_weighted_median(pairs)


def test_weighted_median_degenerate_single_value(spark):
    df = spark.createDataFrame(
        [("G", 5.0, 2.0), ("G", 5.0, 3.0)],
        ["l_returnflag", "l_extendedprice", "l_quantity"],
    )
    from pyspark.sql import Window

    w = df.groupBy(
        F.col("l_returnflag").alias("flag"), F.col("l_extendedprice").alias("v")
    ).agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("wt"))
    win = Window.partitionBy("flag").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy("flag")
    cum = w.select(
        "flag", "v",
        F.sum("wt").over(win).alias("cw"),
        F.sum("wt").over(tot).alias("tw"),
    )
    out = (
        cum.where(F.lit(2) * F.col("cw") >= F.col("tw"))
        .groupBy("flag")
        .agg(F.min("v").alias("wm"))
        .collect()
    )
    assert out[0]["wm"] == 5.0

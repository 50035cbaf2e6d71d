"""Skew-safe aggregation shapes agree exactly with their plain forms, and
sketch aggregates stay inside tolerance vs exact counts."""

from pyspark.sql import functions as F

from isen_projet_bigdata_a3s6_spark.operators.aggregations import (
    count_distinct_two_stage,
    top_k_per_group,
    top_k_per_group_salted,
)


def _skewed(spark, n=5000):
    # one hot group ('hot' ≈ 80% of rows), several cold ones
    rows = [
        ("hot" if i % 5 != 4 else f"cold{i % 3}", i, float((i * 37) % 1000))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "g string, id long, v double")


def test_salted_topk_equals_plain(spark):
    df = _skewed(spark)
    order = [F.col("v").desc(), F.col("id").asc()]
    for k in (1, 7):
        plain = top_k_per_group(df, ["g"], order, k)
        salted = top_k_per_group_salted(df, ["g"], order, k, salt_from=["id"], salt_buckets=8)
        assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_topk_small_groups_survive(spark):
    # groups smaller than k must be returned whole (salting can't drop rows)
    df = spark.createDataFrame([("a", 1, 1.0), ("a", 2, 2.0), ("b", 3, 3.0)],
                               "g string, id long, v double")
    out = top_k_per_group_salted(df, ["g"], [F.col("v").desc(), F.col("id")], 5,
                                 salt_from=["id"], salt_buckets=16)
    assert out.count() == 3


def test_count_distinct_two_stage_exact(spark):
    df = _skewed(spark).withColumn("u", (F.col("id") % 97).cast("long"))
    two = {r["g"]: r["n_u"] for r in
           count_distinct_two_stage(df, ["g"], "u", name="n_u").collect()}
    ref = {r["g"]: r["n"] for r in
           df.groupBy("g").agg(F.countDistinct("u").alias("n")).collect()}
    assert two == ref


def test_hll_and_gk_within_tolerance(spark, sf_dir):
    from isen_projet_bigdata_a3s6_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("hll"),
        F.countDistinct("l_orderkey").alias("exact"),
        F.percentile_approx("l_quantity", 0.5, 10_000).alias("gk_med"),
        F.expr("percentile(l_quantity, 0.5)").alias("med"),
    ).first()
    assert abs(row["hll"] - row["exact"]) / row["exact"] < 0.05
    assert abs(row["gk_med"] - row["med"]) <= 1.0


def test_build_skew_dir_invariants():
    """The hot-key fixture (tools/degenerate_sweep.py --mode skew) must be a
    VALUE-ONLY rewrite: same schemas, same row counts, and every targeted
    key actually hot (≥ 0.8·frac of rows on one value) — otherwise the
    sweep's oracle-parity and straggler advisories test nothing."""
    import importlib.util
    import os

    import pyarrow.parquet as pq

    spec = importlib.util.spec_from_file_location(
        "degenerate_sweep",
        os.path.join(os.path.dirname(__file__), "..", "tools", "degenerate_sweep.py"),
    )
    ds = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ds)
    base = "/root/testdata/sf0.001"
    out = ds.build_skew_dir(base, frac=0.25)
    for f in sorted(os.listdir(base)):
        if not f.endswith(".parquet"):
            continue
        src, dst = os.path.join(base, f), os.path.join(out, f)
        assert pq.read_schema(src).equals(pq.read_schema(dst)), f
        assert pq.read_metadata(src).num_rows == pq.read_metadata(dst).num_rows, f
    li = pq.read_table(os.path.join(out, "lineitem.parquet")).to_pandas()
    ev = pq.read_table(os.path.join(out, "events.parquet")).to_pandas()
    docs = pq.read_table(os.path.join(out, "documents.parquet")).to_pandas()
    emb = pq.read_table(os.path.join(out, "embeddings.parquet")).to_pandas()
    assert li["l_suppkey"].value_counts(normalize=True).iloc[0] >= 0.2
    assert li["l_partkey"].value_counts(normalize=True).iloc[0] >= 0.2
    assert ev["user_id"].value_counts(normalize=True).iloc[0] >= 0.24
    assert docs["text"].value_counts(normalize=True).iloc[0] >= 0.2
    # derived column consistency: n_chars matches the rewritten text
    assert (docs["text"].str.len() == docs["n_chars"]).all()
    assert emb["label"].value_counts(normalize=True).iloc[0] >= 0.3
    # event ids stay unique (rewrites never touch primary keys)
    assert ev["event_id"].is_unique

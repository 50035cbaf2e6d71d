"""Wave-14 tests: expectation suite, readability, PSI drift."""

from pyspark.sql import functions as F

from isen_projet_bigdata_a3s6_spark import queries as Q
from isen_projet_bigdata_a3s6_spark.operators.expectations import (
    Expect,
    run_suite,
)

SF = "/root/testdata/sf0.001"


def test_suite_counts_known_violations(spark):
    df = spark.createDataFrame(
        [
            (1, "a@x.com", 10.0, "A"),
            (2, None, 200.0, "B"),       # null email, price out of range
            (2, "c@x.com", -5.0, "Z"),   # dup id, price low, bad status
            (4, "no-at-sign", 50.0, "A"),  # regex violation
        ],
        ["id", "email", "price", "status"],
    )
    ref = spark.createDataFrame([(1,), (2,)], ["rid"])
    out = {
        r.constraint: r
        for r in run_suite(
            df,
            [
                Expect("not_null", "email"),
                Expect("unique", "id"),
                Expect("in_range", "price", lo=0, hi=100),
                Expect("in_set", "status", values=["A", "B"]),
                Expect("matches", "email", pattern="^[^@]+@[^@]+$"),
                Expect("references", "id", ref=ref, ref_column="rid"),
            ],
        ).collect()
    }
    assert out["not_null(email)"].violations == 1
    assert out["unique(id)"].violations == 1
    assert out["in_range(price)"].violations == 2
    assert out["in_set(status)"].violations == 1
    assert out["matches(email)"].violations == 1
    assert out["references(id)"].violations == 1  # id=4 has no ref row
    for r in out.values():
        assert r.total == 4
        assert r.status == "fail"


def test_suite_is_single_scan(spark):
    """All non-relational constraints must compile into one aggregate:
    the physical plan contains exactly one scan of the input."""
    df = spark.read.parquet(f"{SF}/orders.parquet")
    plan = (
        run_suite(
            df,
            [
                Expect("not_null", "o_orderkey"),
                Expect("in_range", "o_totalprice", lo=0, hi=10**9),
                Expect("in_set", "o_orderstatus", values=["O", "F", "P"]),
            ],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1


def test_q230_clean_table_passes(spark):
    rows = Q.q230_expectation_suite(spark, SF).collect()
    assert len(rows) == 6
    assert all(r.status == "pass" for r in rows)  # synthetic data is clean


def test_q231_readability_scores_sane(spark):
    rows = Q.q231_readability(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.min_flesch <= r.avg_flesch
        assert -500 < r.avg_flesch < 207  # formula's hard ceiling


def test_q232_psi_halves_similar(spark):
    rows = {r.feature: r.psi for r in Q.q232_psi_drift(spark, SF).collect()}
    assert set(rows) == {"value_decile", "event_type"}
    for v in rows.values():
        assert v >= 0  # PSI is a divergence
        # stationary synthetic feed: halves come from one distribution
        assert v < 0.2


def test_q232_detects_injected_drift(spark):
    """Shift the second half's value distribution and PSI must fire."""
    from isen_projet_bigdata_a3s6_spark.sources.readers import load_table
    import os
    import tempfile

    e = load_table(spark, SF, "events")
    n = e.count()
    drifted = e.withColumn(
        "value",
        F.when(F.col("event_id") >= n // 2, F.col("value") * 3 + 500).otherwise(
            F.col("value")
        ),
    )
    tmp = tempfile.mkdtemp(prefix="psi_drift_")
    os.makedirs(f"{tmp}", exist_ok=True)
    drifted.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    rows = {r.feature: r.psi for r in Q.q232_psi_drift(spark, tmp).collect()}
    assert rows["value_decile"] > 0.2  # retrain trigger fires

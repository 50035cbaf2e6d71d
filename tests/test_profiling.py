"""Data-quality report: one-pass aggregation, violation counting."""

from isen_projet_bigdata_a3s6_spark.operators.profiling import (
    quality_report,
    violations_below,
    violations_duplicate,
    violations_not_in,
    violations_null,
)


def test_quality_report_counts(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, None, "B"), (2, -5.0, "C"), (3, 7.0, None)],
        "id long, v double, s string",
    )
    rep = {r["check"]: (r["violations"], r["passed"]) for r in quality_report(
        df,
        {
            "id_unique": violations_duplicate("id"),
            "v_not_null": violations_null("v"),
            "v_non_negative": violations_below("v", 0),
            "s_in_domain": violations_not_in("s", ["A", "B"]),
        },
    ).collect()}
    assert rep["id_unique"] == (1, 0)        # id=2 twice → 1 excess row
    assert rep["v_not_null"] == (1, 0)
    assert rep["v_non_negative"] == (1, 0)   # NULL comparison is not a violation
    assert rep["s_in_domain"] == (1, 0)      # 'C'; NULL excluded
    ok = {r["check"]: r["passed"] for r in quality_report(
        df.filter("id = 1"), {"id_unique": violations_duplicate("id")}
    ).collect()}
    assert ok["id_unique"] == 1


def test_quality_report_single_pass(spark):
    df = spark.createDataFrame([(1, 2.0)], "id long, v double")
    out = quality_report(
        df, {"a": violations_null("v"), "b": violations_below("v", 0)}
    )
    # one aggregate over the scan — no join/union of repeated scans
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") == 1

"""Wave-19 tests: Gini, Benford, mutual information, conformal coverage."""

import math

from pyspark.sql import functions as F

from isen_projet_bigdata_a3s6_spark import queries as Q

SF = "/root/testdata/sf0.001"


def _py_gini(values):
    xs = sorted(values)
    n = len(xs)
    s0 = sum(xs)
    s1 = sum((i + 1) * x for i, x in enumerate(xs))
    return 2.0 * s1 / (n * s0) - (n + 1.0) / n


def test_gini_matches_python_and_bounds(spark):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{SF}/customer.parquet')"
    )
    spend = con.execute(
        """SELECT c_mktsegment, CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY c_mktsegment, o_custkey"""
    ).fetchall()
    by_seg = {}
    for seg, x in spend:
        by_seg.setdefault(seg, []).append(x)
    got = {
        r["segment"]: r
        for r in Q._QUERIES["q253_gini_concentration"](spark, SF).collect()
    }
    for seg, xs in by_seg.items():
        assert abs(got[seg]["gini"] - round(_py_gini(xs), 6)) < 2e-6
        assert 0.0 <= got[seg]["gini"] < 1.0
        assert got[seg]["n"] == len(xs)


def test_gini_extremes(spark):
    # perfectly equal -> 0; one customer owns everything -> (n-1)/n
    assert abs(_py_gini([5.0] * 10)) < 1e-12
    assert abs(_py_gini([0.0] * 9 + [100.0]) - 0.9) < 1e-12


def test_benford_terms_consistent(spark):
    rows = Q._QUERIES["q254_benford_digits"](spark, SF).collect()
    digits = sorted(r["digit"] for r in rows)
    assert set(digits) <= set(range(1, 10))
    n = sum(r["n_obs"] for r in rows)
    for r in rows:
        exp = n * math.log10(1.0 + 1.0 / r["digit"])
        assert abs(r["expected"] - round(exp, 6)) < 1e-9
        assert abs(r["chi2_term"] - round((r["n_obs"] - exp) ** 2 / exp, 6)) < 1e-9


def test_mutual_information_nonnegative_total(spark):
    rows = Q._QUERIES["q255_mutual_information"](spark, SF).collect()
    mi = sum(float(r["mi_term"]) for r in rows)
    # MI >= 0 up to the per-term 1e-9 quantization
    assert mi >= -1e-6
    # marginal consistency: cell counts sum to feed size
    from isen_projet_bigdata_a3s6_spark.sources.readers import load_table

    assert sum(r["nxy"] for r in rows) == load_table(spark, SF, "events").count()
    for r in rows:
        assert 1 <= r["dow"] <= 7


def test_conformal_coverage_near_nominal(spark):
    row = Q._QUERIES["q256_conformal_interval"](spark, SF).collect()[0]
    # split-conformal guarantee: coverage >= 0.9 - O(1/n_calib); allow slack
    # for the small sf0.001 splits
    assert row["coverage"] >= 0.85
    assert row["q90"] > 0
    assert row["n_test"] > 0 and row["n_calib"] > 0

"""Round-9 M4/M7/M8 oracle-promotion pins: the closed-form multiple OLS
and fixed-round IRLS logistic must agree with the Spark-ML reference
surface (ml/pipeline.py), and the shared Gauss-Jordan must be bit-identical
between its Python and SQL twins (that identity IS the q43 oracle's
correctness argument).
"""

import math
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from isen_projet_bigdata_a3s6_spark.ml.irls import (
    logistic_confusion_closed,
    logistic_irls_fit,
    quantize_beta,
)
from isen_projet_bigdata_a3s6_spark.stats.regression import (
    gauss_jordan_inverse,
    gauss_jordan_sql_ctes,
    multiple_ols_closed_form,
)

SF = "/root/testdata/sf0.001"
Q43_DUMMIES = [("l_returnflag", "N"), ("l_returnflag", "R")]
Q44_DUMMIES = [
    ("o_orderpriority", "2-HIGH"),
    ("o_orderpriority", "3-MEDIUM"),
    ("o_orderpriority", "4-NOT SPECIFIED"),
    ("o_orderpriority", "5-LOW"),
]


def test_gauss_jordan_python_sql_bit_identity():
    random.seed(123)
    for _ in range(8):
        k = random.choice([2, 3, 5, 6])
        x = [[random.gauss(0, 1) for _ in range(k)] for _ in range(3 * k)]
        a = [
            [sum(x[r][i] * x[r][j] for r in range(3 * k)) for j in range(k)]
            for i in range(k)
        ]
        inv_py = gauss_jordan_inverse(a)
        from isen_projet_bigdata_a3s6_spark.functions.similarity import _sql_double

        cells = ", ".join(
            f"{_sql_double(a[i][j])} AS m_{i}_{j}"
            for i in range(k)
            for j in range(k)
        )
        gj, ginv = gauss_jordan_sql_ctes(k, "mat")
        sql = f"WITH mat AS (SELECT {cells}),\n {gj}\nSELECT * FROM {ginv}"
        cur = duckdb.sql(sql)
        got = dict(zip([d[0] for d in cur.description], cur.fetchone()))
        for i in range(k):
            for j in range(k):
                assert got[f"inv_{i}_{j}"] == inv_py[i][j], (k, i, j)


def test_gauss_jordan_singular_fails_loud():
    with pytest.raises(ValueError, match="singular"):
        gauss_jordan_inverse([[1.0, 1.0], [1.0, 1.0]])


def test_q43_closed_form_matches_spark_ml(spark):
    """Group-level predictions of the closed-form fit must match the
    Spark-ML normal-solver fit (different dummy parametrizations — R-style
    alphabetical vs StringIndexer frequency — describe the same model, so
    fitted values agree)."""
    from isen_projet_bigdata_a3s6_spark.ml.pipeline import fit_multiple_ols

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    cf = {
        r["feature"]: r["coefficient"]
        for r in multiple_ols_closed_form(
            li, "l_extendedprice", ["l_quantity", "l_discount"], Q43_DUMMIES
        ).collect()
    }
    _, ml = fit_multiple_ols(
        li, "l_extendedprice", ["l_quantity", "l_discount"], ["l_returnflag"]
    )
    mlc = {r["feature"]: r["coefficient"] for r in ml.collect()}

    def pred_cf(qty, disc, flag):
        return (
            cf["intercept"]
            + cf["l_quantity"] * qty
            + cf["l_discount"] * disc
            + cf.get(f"l_returnflag={flag}", 0.0)
        )

    def pred_ml(qty, disc, flag):
        return (
            mlc["intercept"]
            + mlc["l_quantity"] * qty
            + mlc["l_discount"] * disc
            + mlc.get(f"l_returnflag={flag}", 0.0)
        )

    for qty, disc, flag in [(1, 0.0, "A"), (25, 0.05, "N"), (50, 0.1, "R")]:
        a, b = pred_cf(qty, disc, flag), pred_ml(qty, disc, flag)
        assert abs(a - b) <= 1e-6 * max(1.0, abs(a)), (qty, disc, flag, a, b)


def test_q43_closed_form_empty_in_empty_out(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").filter(F.lit(False))
    out = multiple_ols_closed_form(
        li, "l_extendedprice", ["l_quantity", "l_discount"], Q43_DUMMIES
    )
    assert out.count() == 0
    assert out.columns == ["feature", "coefficient", "std_error", "t_value"]


def _orders_labeled(spark, sf=SF):
    o = spark.read.parquet(f"{sf}/orders.parquet").filter(
        F.col("o_orderstatus").isNotNull()
    )
    return o.withColumn(
        "is_closed", F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0)
    )


def test_q44_irls_matches_spark_ml_probabilities(spark):
    """The fixed-round IRLS MLE and Spark ML's L-BFGS fit (tol 1e-6,
    standardized internally) are the same optimum: per-row predicted
    probabilities must agree to ~1e-4."""
    from isen_projet_bigdata_a3s6_spark.ml.pipeline import fit_logistic

    o = _orders_labeled(spark)
    beta = logistic_irls_fit(o, "is_closed", ["o_totalprice"], Q44_DUMMIES)
    _, scored = fit_logistic(
        o, "is_closed", ["o_totalprice"], ["o_orderpriority"]
    )
    rows = scored.select(
        "o_totalprice", "o_orderpriority", "probability_1"
    ).collect()
    levels = [lv for _, lv in Q44_DUMMIES]
    worst = 0.0
    for r in rows:
        z = beta[0] + beta[1] * r["o_totalprice"]
        for i, lv in enumerate(levels):
            if r["o_orderpriority"] == lv:
                z += beta[2 + i]
        p = 1.0 / (1.0 + math.exp(-z))
        worst = max(worst, abs(p - r["probability_1"]))
    assert worst < 1e-4, worst


def test_q44_quantized_confusion_totals(spark):
    o = _orders_labeled(spark)
    cm = logistic_confusion_closed(
        o, "is_closed", ["o_totalprice"], Q44_DUMMIES
    ).collect()
    assert sum(r["n"] for r in cm) == o.count()
    assert all(r["prediction"] in (0, 1) and r["label"] in (0, 1) for r in cm)


def test_q44_irls_empty_in_empty_out(spark):
    o = _orders_labeled(spark).filter(F.lit(False))
    out = logistic_confusion_closed(
        o, "is_closed", ["o_totalprice"], Q44_DUMMIES
    )
    assert out.count() == 0
    assert out.columns == ["label", "prediction", "n"]


def test_quantize_beta_per_feature_decimals():
    b = [0.123456789012345, 1.23456789012345e-7, 0.987654321987]
    q = quantize_beta(b, 1)
    assert q[0] == round(b[0], 8)
    assert q[1] == round(b[1], 12)
    assert q[2] == round(b[2], 8)

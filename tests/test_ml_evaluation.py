"""ML evaluation parity: splits, evaluator bundles, GLM summary.

Metric math is pinned to independent references — Spark ML's evaluators for
the metric bundles, a numpy IRLS for the GLM coefficient table — so the
single-pass aggregate implementations can't drift."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from isen_projet_bigdata_a3s6_spark.ml.evaluation import (
    classification_metrics,
    fit_glm_binomial,
    hash_split,
    modulo_split,
    regression_metrics,
)


@pytest.fixture(scope="module")
def scored_clf(spark):
    # deterministic synthetic predictions: y in {0,1}, prediction flips on a
    # known subset so tp/fp/fn/tn are all non-trivial
    rows = [(i, float(i % 2), float((i % 2) ^ (i % 7 == 0))) for i in range(200)]
    return spark.createDataFrame(rows, "id long, label double, prediction double")


def test_classification_metrics_match_evaluator(scored_clf):
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator

    got = classification_metrics(scored_clf, "label").collect()[0]
    base = dict(predictionCol="prediction", labelCol="label")
    acc = MulticlassClassificationEvaluator(metricName="accuracy", **base).evaluate(scored_clf)
    prec = MulticlassClassificationEvaluator(
        metricName="precisionByLabel", metricLabel=1.0, **base
    ).evaluate(scored_clf)
    rec = MulticlassClassificationEvaluator(
        metricName="recallByLabel", metricLabel=1.0, **base
    ).evaluate(scored_clf)
    f1 = MulticlassClassificationEvaluator(
        metricName="fMeasureByLabel", metricLabel=1.0, **base
    ).evaluate(scored_clf)
    assert got["accuracy"] == pytest.approx(acc, abs=1e-12)
    assert got["precision"] == pytest.approx(prec, abs=1e-12)
    assert got["recall"] == pytest.approx(rec, abs=1e-12)
    assert got["f1"] == pytest.approx(f1, abs=1e-12)
    assert got["n"] == 200


def test_regression_metrics_match_evaluator(spark):
    from pyspark.ml.evaluation import RegressionEvaluator

    rows = [(i, float(i) * 0.5 + 3.0, float(i) * 0.5 + 3.0 + ((i % 5) - 2) * 0.25) for i in range(100)]
    scored = spark.createDataFrame(rows, "id long, label double, pred double")
    got = regression_metrics(scored, "label", "pred").collect()[0]
    base = dict(predictionCol="pred", labelCol="label")
    for metric, key in [("r2", "r2"), ("rmse", "rmse"), ("mae", "mae")]:
        want = RegressionEvaluator(metricName=metric, **base).evaluate(scored)
        assert got[key] == pytest.approx(want, rel=1e-9), metric


def test_splits_partition_and_are_deterministic(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = o.count()
    for split in (
        lambda d: modulo_split(d, "o_orderkey", k=5),
        lambda d: hash_split(d, ["o_orderkey"], test_frac=0.2),
    ):
        train, test = split(o)
        nt, ne = train.count(), test.count()
        assert nt + ne == n
        assert train.join(test, "o_orderkey", "inner").count() == 0
        # retry/repartition stability: same membership at a different layout
        train2, test2 = split(o.repartition(13))
        assert test2.select("o_orderkey").exceptAll(test.select("o_orderkey")).count() == 0
        assert test2.count() == ne


def _numpy_irls(X, y, max_iter=50, tol=1e-10):
    """Reference binomial GLM (logit) via IRLS; returns (beta, std_errors)
    with the intercept as column 0."""
    Xd = np.column_stack([np.ones(len(y)), X])
    beta = np.zeros(Xd.shape[1])
    for _ in range(max_iter):
        eta = Xd @ beta
        mu = 1.0 / (1.0 + np.exp(-eta))
        w = mu * (1.0 - mu)
        z = eta + (y - mu) / np.clip(w, 1e-12, None)
        WX = Xd * w[:, None]
        beta_new = np.linalg.solve(Xd.T @ WX, Xd.T @ (w * z))
        if np.max(np.abs(beta_new - beta)) < tol:
            beta = beta_new
            break
        beta = beta_new
    eta = Xd @ beta
    mu = 1.0 / (1.0 + np.exp(-eta))
    w = mu * (1.0 - mu)
    cov = np.linalg.inv(Xd.T @ (Xd * w[:, None]))
    return beta, np.sqrt(np.diag(cov))


def test_glm_binomial_matches_numpy_irls(spark):
    rng = np.random.RandomState(7)
    x1 = rng.normal(size=400)
    x2 = rng.normal(size=400)
    logit = 0.8 * x1 - 1.2 * x2 + 0.3
    y = (rng.uniform(size=400) < 1.0 / (1.0 + np.exp(-logit))).astype(float)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)],
        "x1 double, x2 double, y double",
    )
    _, summary = fit_glm_binomial(df, "y", ["x1", "x2"])
    rows = {r["feature"]: r for r in summary.collect()}
    beta, se = _numpy_irls(np.column_stack([x1, x2]), y)
    for i, feat in enumerate(["intercept", "x1", "x2"]):
        assert rows[feat]["coefficient"] == pytest.approx(beta[i], abs=1e-5)
        assert rows[feat]["std_error"] == pytest.approx(se[i], rel=1e-4)
        z = beta[i] / se[i]
        assert rows[feat]["z_value"] == pytest.approx(z, rel=1e-4)


def test_stream_stream_join_equals_batch_twin(spark, sf_dir):
    from isen_projet_bigdata_a3s6_spark.sources.readers import load_table
    from isen_projet_bigdata_a3s6_spark.streaming.joins import (
        batch_time_bounded_join,
        stream_stream_time_bounded_join,
    )

    events = load_table(spark, sf_dir, "events")
    batch = batch_time_bounded_join(events)
    stream = stream_stream_time_bounded_join(
        spark, f"{sf_dir}/events.parquet", query_name="t_stream_join_out"
    )
    assert stream.count() == batch.count()
    assert stream.exceptAll(batch).count() == 0
    assert batch.exceptAll(stream).count() == 0


def test_pca_matches_numpy(spark):
    import numpy as np

    from isen_projet_bigdata_a3s6_spark.ml.pca import pca_fit, pca_project

    rng = np.random.default_rng(7)
    X = rng.standard_normal((200, 6)) @ np.diag([5, 3, 1, 0.5, 0.2, 0.1])
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(X)], "id long, v array<double>"
    ).repartition(5)
    mean, comps = pca_fit(df, "v", k=3)
    assert np.allclose(mean, X.mean(axis=0), atol=1e-9)
    cov = np.cov(X, rowvar=False)
    w, v = np.linalg.eigh(cov)
    ref = v[:, np.argsort(w)[::-1][:3]].T
    for i in range(3):
        j = int(np.argmax(np.abs(ref[i])))
        if ref[i, j] < 0:
            ref[i] = -ref[i]
    assert np.allclose(comps, ref, atol=1e-8)
    out = {r["id"]: r["pc"] for r in pca_project(df, "v", mean, comps).collect()}
    P = (X - X.mean(axis=0)) @ ref.T
    for i in range(200):
        assert np.allclose(out[i], P[i], atol=1e-8)


def test_pca_k_guard(spark):
    import pytest

    from isen_projet_bigdata_a3s6_spark.ml.pca import pca_fit

    df = spark.createDataFrame([(1, [1.0, 2.0]), (2, [2.0, 1.0])], "id long, v array<double>")
    with pytest.raises(ValueError):
        pca_fit(df, "v", k=3)

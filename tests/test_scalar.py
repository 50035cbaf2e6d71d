"""Unit tests for scalar semantics nuances (SURVEY §5.3)."""

from pyspark.sql import functions as F

from isen_projet_bigdata_a3s6_spark.functions.scalar import (
    bucketize,
    empty_to_null,
    euclidean_distance,
    outlier_cap,
    title_case,
)


def test_title_case_hyphen(spark):
    # str_to_title parity: capitalize after '-' (R_groupe4.R:178)
    df = spark.createDataFrame([("SAINT-JEAN",), ("centre ville",)], "s string")
    got = [r[0] for r in df.select(title_case("s")).collect()]
    assert got == ["Saint-Jean", "Centre Ville"]


def test_empty_to_null(spark):
    df = spark.createDataFrame([("",), ("  ",), ("x",), (None,)], "s string")
    got = [r[0] for r in df.select(empty_to_null("s")).collect()]
    assert got == [None, None, "x", None]


def test_outlier_cap(spark):
    df = spark.createDataFrame([(500.0,), (299.0,), (None,)], "v double")
    got = [r[0] for r in df.select(outlier_cap("v", 300, 200)).collect()]
    assert got == [200.0, 299.0, None]


def test_bucketize(spark):
    df = spark.createDataFrame([(100.0,), (700.0,), (2000.0,)], "v double")
    got = [
        r[0]
        for r in df.select(
            bucketize("v", [(500.0, "vert"), (1000.0, "jaune")], "rouge")
        ).collect()
    ]
    assert got == ["vert", "jaune", "rouge"]


def test_euclidean_distance(spark):
    df = spark.createDataFrame([(0.0, 0.0, 3.0, 4.0)], "x1 double, y1 double, x2 double, y2 double")
    got = df.select(
        euclidean_distance(F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2"))
    ).collect()[0][0]
    assert got == 5.0

"""Cleaning-operator semantics on literal frames (W1/W2/F2 nuances)."""

from pyspark.sql import functions as F

from isen_projet_bigdata_a3s6_spark.operators.cleaning import (
    dedup_keep_first,
    drop_null_rows,
    fill_string_nulls,
    groupwise_first_fill,
    groupwise_mode_fill,
)


def test_dedup_keep_first_keeps_lowest_order(spark):
    df = spark.createDataFrame(
        [(1, 10, "b"), (1, 5, "a"), (2, 7, "c")], "k int, ord int, v string"
    )
    got = {
        (r["k"], r["v"]) for r in dedup_keep_first(df, ["k"], ["ord"]).collect()
    }
    assert got == {(1, "a"), (2, "c")}


def test_groupwise_first_fill_ignore_nulls(spark):
    # W1: first NON-NULL value fills the group's nulls
    df = spark.createDataFrame(
        [("g1", None), ("g1", "x"), ("g1", None), ("g2", None)], "g string, v string"
    )
    out = groupwise_first_fill(df, "v", "g", ignore_nulls=True)
    vals = {(r["g"], r["v"]) for r in out.collect()}
    assert ("g1", None) not in vals and ("g1", "x") in vals
    assert ("g2", None) in vals  # all-null group stays null


def test_groupwise_mode_fill_default(spark):
    df = spark.createDataFrame(
        [("g1", "a"), ("g1", "a"), ("g1", None), ("g2", None)], "g string, v string"
    )
    out = groupwise_mode_fill(df, "v", "g", default="AUTRE")
    vals = sorted((r["g"], r["v"]) for r in out.collect())
    assert vals == [("g1", "a"), ("g1", "a"), ("g1", "a"), ("g2", "AUTRE")]


def test_drop_null_rows_single_pass(spark):
    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (2, None)], "x int, y string"
    )
    assert drop_null_rows(df, ["x", "y"]).count() == 1


def test_fill_string_nulls_only_strings(spark):
    df = spark.createDataFrame([(None, None)], "s string, d double")
    row = fill_string_nulls(df, "Inconnue").collect()[0]
    assert row["s"] == "Inconnue" and row["d"] is None


def test_interpolate_linear_hand_values(spark):
    import datetime as dt

    from isen_projet_bigdata_a3s6_spark.operators.cleaning import interpolate_linear

    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    df = spark.createDataFrame(
        [
            # gap interpolated with time weighting (not midpoint): 10→40 over
            # 30s, null at +10s → 20.0
            ("a", 1, ts(0), 10.0),
            ("a", 2, ts(10), None),
            ("a", 3, ts(30), 40.0),
            # leading null → bfill; trailing null → ffill
            ("b", 4, ts(0), None),
            ("b", 5, ts(10), 5.0),
            ("b", 6, ts(20), None),
            # all-null key stays null
            ("c", 7, ts(0), None),
        ],
        "k string, id long, ts timestamp, v double",
    )
    out = interpolate_linear(df, "v", "ts", ["k"], out_col="vf", tiebreak=["id"])
    got = {r["id"]: r["vf"] for r in out.collect()}
    assert got[1] == 10.0 and got[3] == 40.0
    assert got[2] == 20.0
    assert got[4] == 5.0 and got[6] == 5.0
    assert got[7] is None

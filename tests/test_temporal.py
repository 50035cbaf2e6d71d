"""Temporal operators: as-of join, interval join, rolling time agg —
hand-computable fixtures pin the exact semantics (boundaries, ties,
tolerance, direction). The registry queries q83-q85 add oracle parity."""

import datetime as dt

from pyspark.sql import functions as F

from isen_projet_bigdata_a3s6_spark.operators.temporal import (
    asof_join,
    interval_join,
    rolling_time_agg,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def ts(sec):
    return T0 + dt.timedelta(seconds=sec)


def _left(spark):
    return spark.createDataFrame(
        [(1, "a", ts(10)), (2, "a", ts(20)), (3, "a", ts(4)), (4, "b", ts(10))],
        "id long, k string, ts timestamp",
    )


def _right(spark):
    return spark.createDataFrame(
        [
            ("a", ts(5), 1.0, 100),
            ("a", ts(10), 2.0, 101),
            ("a", ts(10), 3.0, 102),  # tie at ts=10 — greatest rid wins backward
            ("c", ts(1), 9.0, 103),
        ],
        "k string, ts timestamp, v double, rid long",
    )


def test_asof_backward_exact_and_ties(spark):
    out = asof_join(
        _left(spark), _right(spark), on=["k"], left_ts="ts", right_ts="ts",
        payload_cols=["v"], right_tiebreak="rid",
    )
    got = {r["id"]: (r["matched_ts"], r["v"]) for r in out.collect()}
    assert got[3] == (None, None)          # nothing at-or-before ts=4
    assert got[1] == (ts(10), 3.0)         # exact match; tie → rid 102
    assert got[2] == (ts(10), 3.0)         # most recent ≤ 20
    assert got[4] == (None, None)          # key 'b' has no build rows
    assert out.count() == 4                # left-preserving


def test_asof_backward_excl_exact(spark):
    out = asof_join(
        _left(spark), _right(spark), on=["k"], left_ts="ts", right_ts="ts",
        payload_cols=["v"], right_tiebreak="rid", allow_exact_matches=False,
    )
    got = {r["id"]: r["v"] for r in out.collect()}
    assert got[1] == 1.0                   # ts=10 excluded → ts=5
    assert got[2] == 3.0


def test_asof_forward(spark):
    out = asof_join(
        _left(spark), _right(spark), on=["k"], left_ts="ts", right_ts="ts",
        payload_cols=["v"], right_tiebreak="rid", direction="forward",
    )
    got = {r["id"]: (r["matched_ts"], r["v"]) for r in out.collect()}
    assert got[3] == (ts(5), 1.0)          # earliest ≥ 4
    assert got[1] == (ts(10), 2.0)         # forward tie → smallest rid wins
    assert got[2] == (None, None)          # nothing at-or-after 20


def test_asof_tolerance(spark):
    out = asof_join(
        _left(spark), _right(spark), on=["k"], left_ts="ts", right_ts="ts",
        payload_cols=["v"], right_tiebreak="rid", tolerance_seconds=3,
    )
    got = {r["id"]: r["v"] for r in out.collect()}
    assert got[1] == 3.0                   # gap 0 ≤ 3
    assert got[2] is None                  # gap 10 > 3 → nulled


def test_asof_no_join_in_plan(spark):
    out = asof_join(
        _left(spark), _right(spark), on=["k"], left_ts="ts", right_ts="ts",
        payload_cols=["v"], right_tiebreak="rid",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan              # union + window only


def test_interval_join_boundaries_and_small_buckets(spark):
    intervals = spark.createDataFrame(
        [(1, ts(0), ts(10)), (2, ts(5), ts(30)), (3, ts(100), ts(110))],
        "iid long, s timestamp, e timestamp",
    )
    points = spark.createDataFrame(
        [(10, ts(0)), (11, ts(9)), (12, ts(10)), (13, ts(29)), (14, ts(50))],
        "pid long, ts timestamp",
    )
    for bucket in (None, 3.0):  # default (max length) and bucket << interval
        pairs = interval_join(
            points, intervals, point_ts="ts", start_col="s", end_col="e",
            bucket_seconds=bucket,
        )
        got = sorted((r["iid"], r["pid"]) for r in pairs.collect())
        # [s, e): start inclusive, end exclusive; each pair exactly once
        assert got == [(1, 10), (1, 11), (2, 11), (2, 12), (2, 13)]
    inc = interval_join(
        points, intervals, point_ts="ts", start_col="s", end_col="e",
        end_inclusive=True,
    )
    got = sorted((r["iid"], r["pid"]) for r in inc.collect())
    assert (1, 12) in got


def test_interval_join_with_keys(spark):
    intervals = spark.createDataFrame(
        [("u1", 1, ts(0), ts(10)), ("u2", 2, ts(0), ts(10))],
        "k string, iid long, s timestamp, e timestamp",
    )
    points = spark.createDataFrame(
        [("u1", 10, ts(5)), ("u2", 11, ts(5))], "k string, pid long, ts timestamp"
    )
    pairs = interval_join(
        points, intervals, point_ts="ts", start_col="s", end_col="e", on=["k"]
    )
    got = sorted((r["iid"], r["pid"]) for r in pairs.collect())
    assert got == [(1, 10), (2, 11)]


def test_rolling_time_agg_range_frame_ties(spark):
    df = spark.createDataFrame(
        [("a", ts(0), 1.0), ("a", ts(300), 2.0), ("a", ts(300), 4.0), ("a", ts(1200), 8.0)],
        "k string, ts timestamp, v double",
    )
    out = rolling_time_agg(
        df, partition_by=["k"], ts_col="ts",
        aggs={"s": F.sum("v"), "n": F.count("v")}, window_seconds=600,
    )
    got = sorted((r["ts"], r["s"], r["n"]) for r in out.collect())
    # RANGE frame: the two ts=300 rows are peers — both see both
    assert got == [
        (ts(0), 1.0, 1),
        (ts(300), 7.0, 3),
        (ts(300), 7.0, 3),
        (ts(1200), 8.0, 1),
    ]


def test_ewma_matches_numpy_recurrence(spark):
    import numpy as np

    from isen_projet_bigdata_a3s6_spark.operators.temporal import ewma

    vals = [3.0, 1.0, 4.0, 1.5, 9.0, 2.6]
    rows = [(i, "u", f"2024-01-01 00:0{i}:00", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "event_id long, user_id string, ts string, value double") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["event_id"]: r["ewma"]
           for r in ewma(df, "value", "ts", ["user_id"], alpha=0.3).collect()}
    y = np.empty(len(vals))
    y[0] = vals[0]
    for i in range(1, len(vals)):
        y[i] = 0.3 * vals[i] + 0.7 * y[i - 1]
    for i in range(len(vals)):
        assert abs(out[i] - y[i]) < 1e-12


def test_ewma_alpha_guard(spark):
    import pytest

    from isen_projet_bigdata_a3s6_spark.operators.temporal import ewma

    df = spark.createDataFrame([(1, "u", 1.0)], "event_id long, user_id string, value double")
    with pytest.raises(ValueError):
        ewma(df, "value", "event_id", ["user_id"], alpha=0.0)

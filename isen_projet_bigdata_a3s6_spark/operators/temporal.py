"""Temporal join operators (SURVEY §2.4 extension — time-series shapes).

Spark has no built-in AS-OF or interval join; both are re-expressed here as
shuffle-friendly compositions (the brief's sanctioned path for operators the
engine lacks):

- :func:`asof_join` — union + single window pass. NO join at all: tag both
  inputs, sort once per key, and let ``last_value(ignorenulls)`` carry the
  most recent build row forward onto each probe row. One shuffle on the key
  columns, one sort — identical cost to any other window, regardless of how
  skewed the probe/build time distributions are. This beats the
  join-then-filter formulation (which explodes on dense build sides) and is
  the standard large-scale as-of shape.
- :func:`interval_join` — bucketed equi-join. Intervals are exploded onto
  the fixed-width time buckets they cover; points map to exactly one bucket;
  the join is a pure equi-join on bucket + range filter. Each matching
  (interval, point) pair is produced exactly once because a point lives in
  one bucket only — no post-join dedup. Bucket width defaults to the max
  interval length so every interval covers ≤ 2 buckets.
- :func:`rolling_time_agg` — RANGE-frame rolling aggregate over event time
  (a true time-based sliding window, not a row-count frame). Decimal
  accumulation keeps the float path deterministic for oracle parity.

At 100 TB: all three are one shuffle on the equality keys (or on nothing but
the bucket for keyless interval joins); none ever materialises a cross
product. Skewed keys behave like any window/groupBy skew — AQE skew handling
or salting applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance_seconds: float | None = None,
    right_tiebreak: str | None = None,
    matched_ts_col: str = "matched_ts",
) -> DataFrame:
    """AS-OF join: for each left row, attach the payload of the single right
    row with the greatest ``right_ts`` ≤ ``left_ts`` (direction='backward';
    'forward' mirrors to the smallest ≥). Left rows are always preserved
    (LEFT semantics); unmatched rows carry nulls.

    Ties inside the right side (several right rows at one (key, ts)) are
    broken by ``right_tiebreak`` — the row with the greatest tiebreak wins
    for 'backward' (the "latest write"), smallest for 'forward'. Pass a
    unique column for fully deterministic output; without one the winner
    among exact right-side duplicates is unspecified (matches DuckDB/pandas
    ASOF behavior).

    ``tolerance_seconds`` nulls the match when the time gap exceeds it
    (pandas ``merge_asof`` tolerance semantics).

    Implementation: union-tag-window. Right rows and left rows are unioned
    on the key/time axis, sorted once per key, and the payload is carried
    onto probes with ``last_value(ignorenulls=True)``. One shuffle + one
    sort; no join operator anywhere in the plan.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: direction must be backward|forward, got {direction!r}")
    for c in payload_cols + [matched_ts_col]:
        if c in left.columns:
            raise ValueError(
                f"asof_join: output column {c!r} collides with a left column — alias it first"
            )

    left_cols = left.columns
    # normalized event-time axis: micros for timestamps, raw for numerics
    def ts_axis(df: DataFrame, col: str) -> Column:
        dt = dict(df.dtypes)[col]
        return F.unix_micros(F.col(col)) if dt.startswith("timestamp") else F.col(col).cast("double")

    tb = right_tiebreak
    r = right.select(
        *[F.col(c) for c in on],
        ts_axis(right, right_ts).alias("__axis"),
        F.col(right_ts).alias(matched_ts_col),
        *[F.col(c) for c in payload_cols],
        (F.col(tb) if tb else F.lit(0)).alias("__tb"),
        F.lit(0).alias("__probe"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"__l_{c}") for c in left_cols],
    )
    l = left.select(
        *[F.col(c) for c in on],
        ts_axis(left, left_ts).alias("__axis"),
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias(matched_ts_col),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in payload_cols],
        F.lit(None).cast(r.schema["__tb"].dataType).alias("__tb"),
        F.lit(1).alias("__probe"),
        *[F.col(c).alias(f"__l_{c}") for c in left_cols],
    )
    u = l.unionByName(r)

    backward = direction == "backward"
    axis = F.col("__axis").asc() if backward else F.col("__axis").desc()
    # build rows must sort before probes at equal ts iff exact matches count
    probe_rank = F.col("__probe").asc() if allow_exact_matches else F.col("__probe").desc()
    # among build rows at one ts the LAST in sort order wins last_value:
    # backward → greatest tiebreak last; forward (desc axis) → smallest last
    tie = F.col("__tb").asc_nulls_first() if backward else F.col("__tb").desc_nulls_first()
    w = (
        W.partitionBy(*on)
        .orderBy(axis, probe_rank, tie)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )

    carried = [matched_ts_col, *payload_cols]
    out = u.select(
        "*", *[F.last(c, ignorenulls=True).over(w).alias(f"__m_{c}") for c in carried]
    ).filter(F.col("__probe") == 1)

    if tolerance_seconds is not None:
        gap = F.col("__axis") - ts_axis(out, f"__m_{matched_ts_col}")
        if not backward:
            gap = -gap
        dt = dict(right.dtypes)[right_ts]
        tol = tolerance_seconds * (1_000_000 if dt.startswith("timestamp") else 1)
        ok = gap <= F.lit(tol)
        out = out.select(
            "*",
            *[
                F.when(ok, F.col(f"__m_{c}")).alias(f"__t_{c}")
                for c in carried
            ],
        )
        final = [F.col(f"__l_{c}").alias(c) for c in left_cols] + [
            F.col(f"__t_{c}").alias(c) for c in carried
        ]
    else:
        final = [F.col(f"__l_{c}").alias(c) for c in left_cols] + [
            F.col(f"__m_{c}").alias(c) for c in carried
        ]
    return out.select(*final)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    bucket_seconds: float | None = None,
    end_inclusive: bool = False,
) -> DataFrame:
    """Interval (range) join: pair every interval with the points falling in
    ``[start, end)`` (``end_inclusive=True`` → ``[start, end]``), optionally
    also matching equality keys ``on``. Returns interval columns + point
    columns (caller guarantees disjoint names).

    Implementation: fixed-width time bucketing. Every interval explodes onto
    the buckets it covers (``sequence`` — with the default bucket width =
    the longest interval, that is ≤ 2 rows per interval); every point maps
    to exactly ONE bucket, so each qualifying pair is emitted exactly once —
    a pure equi-join on (bucket, *on) + range filter, no cross product and
    no dedup. This is the standard scalable range-join shape; Spark's own
    optimizer has no native interval join to fall back on.
    """
    def micros(df: DataFrame, col: str) -> Column:
        dt = dict(df.dtypes)[col]
        return F.unix_micros(F.col(col)) if dt.startswith("timestamp") else F.col(col).cast("long")

    if bucket_seconds is None:
        mx = intervals.agg(
            F.max(micros(intervals, end_col) - micros(intervals, start_col)).alias("m")
        ).first()["m"]
        if mx is None:
            raise ValueError("interval_join: empty intervals side")
        bucket_us = max(int(mx), 1)
    else:
        bucket_us = max(int(bucket_seconds * 1_000_000), 1)

    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (micros(intervals, start_col) / bucket_us).cast("long"),
                (micros(intervals, end_col) / bucket_us).cast("long"),
            )
        ),
    )
    p = points.withColumn("__bucket", (micros(points, point_ts) / bucket_us).cast("long"))
    keys = ["__bucket", *(on or [])]
    pt = F.col(point_ts)
    in_range = (pt >= F.col(start_col)) & (
        (pt <= F.col(end_col)) if end_inclusive else (pt < F.col(end_col))
    )
    return i.join(p, on=keys, how="inner").filter(in_range).drop("__bucket")


def rolling_time_agg(
    df: DataFrame,
    partition_by: list[str],
    ts_col: str,
    aggs: dict[str, Column],
    window_seconds: float,
) -> DataFrame:
    """Rolling event-time aggregate: for each row, aggregate over the rows of
    the same partition whose timestamp lies in ``[ts - window, ts]`` — a
    RANGE frame on the time axis (timestamp order values that tie share one
    frame, per SQL RANGE semantics). One shuffle + one sort.

    ``aggs`` maps output column name → aggregate Column built on ``F``
    (e.g. ``{"avg_v": F.avg(dec("value", 18, 6))}``); the frame is applied
    here. Use decimal inputs for deterministic float paths (oracle parity).
    """
    axis = F.unix_micros(F.col(ts_col))
    w = (
        W.partitionBy(*partition_by)
        .orderBy(axis.asc())
        .rangeBetween(-int(window_seconds * 1_000_000), 0)
    )
    out = df
    for name, col in aggs.items():
        out = out.withColumn(name, col.over(w))
    return out


def ewma(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    partition_by: list[str],
    alpha: float = 0.3,
    out_col: str = "ewma",
    tiebreak: str | None = None,
) -> DataFrame:
    """Exponentially weighted moving average per key, ordered by event
    time: y_t = α·x_t + (1−α)·y_{t−1} (pandas ``ewm(adjust=False)``
    semantics). The recurrence is inherently sequential WITHIN a key, so
    this is the sanctioned Arrow path — ``applyInPandas`` per key group,
    vectorized by pandas inside each group; across keys it parallelizes
    like any groupBy. State is one scalar per key, never the window.
    NULL values propagate the previous EWMA (gap-skip, like pandas
    ``ignore_na=False`` on non-null streams). ``tiebreak`` pins the
    order of equal-timestamp rows (hot-key fixtures merge users, so
    (key, ts) alone is not a total order there — r06 oracle
    promotion)."""
    if not 0 < alpha <= 1:
        raise ValueError("ewma: alpha must be in (0, 1]")
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(df.schema.fields + [StructField(out_col, DoubleType())])
    sort_cols = [ts_col] if tiebreak is None else [ts_col, tiebreak]

    def per_group(pdf):
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        pdf[out_col] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pdf

    return df.groupBy(*partition_by).applyInPandas(per_group, schema)

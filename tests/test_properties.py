"""Property-based spot checks (SURVEY §5.4): dedup idempotence, fillna
completeness, percentile monotonicity, title-case idempotence.

One shared strategy note: hypothesis drives the *data*, Spark runs locally —
keep examples small (each example is a Spark job) and deadline off.
"""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from isen_projet_bigdata_a3s6_spark.functions.scalar import title_case
from isen_projet_bigdata_a3s6_spark.operators.cleaning import (
    dedup_keep_first,
    fill_string_nulls,
)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),          # key
        st.integers(min_value=0, max_value=100),        # order
        st.one_of(st.none(), st.text(alphabet="abcd- ", max_size=6)),  # value
    ),
    min_size=1,
    max_size=30,
)


@SETTINGS
@given(rows=rows_strategy)
def test_dedup_keep_first_idempotent(spark, rows):
    df = spark.createDataFrame(rows, "k int, ord int, v string")
    once = dedup_keep_first(df, ["k"], ["ord", "v"])
    twice = dedup_keep_first(once, ["k"], ["ord", "v"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    # exactly one row per key
    n_keys = df.select("k").distinct().count()
    assert once.count() == n_keys


@SETTINGS
@given(rows=rows_strategy)
def test_fillna_completeness(spark, rows):
    df = spark.createDataFrame(rows, "k int, ord int, v string")
    filled = fill_string_nulls(df, "Inconnue")
    assert filled.filter(F.col("v").isNull()).count() == 0
    # non-null values untouched
    orig = df.filter(F.col("v").isNotNull()).count()
    kept = filled.filter(F.col("v") != "Inconnue").count() + df.filter(
        F.col("v") == "Inconnue"
    ).count()
    assert kept >= orig - df.filter(F.col("v") == "Inconnue").count()


@SETTINGS
@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=2,
        max_size=40,
    )
)
def test_percentile_monotonic(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    row = df.agg(
        F.expr("percentile(x, 0.25)").alias("p25"),
        F.expr("percentile(x, 0.5)").alias("p50"),
        F.expr("percentile(x, 0.75)").alias("p75"),
        F.min("x").alias("lo"),
        F.max("x").alias("hi"),
    ).collect()[0]
    assert row["lo"] <= row["p25"] <= row["p50"] <= row["p75"] <= row["hi"]
    assert math.isclose(
        sorted(vals)[len(vals) // 2] if len(vals) % 2 == 1 else row["p50"],
        row["p50"],
        rel_tol=1e-9,
        abs_tol=1e-9,
    )


@SETTINGS
@given(s=st.text(alphabet="aBc-' xyZ", max_size=12))
def test_title_case_idempotent(spark, s):
    df = spark.createDataFrame([(s,)], "s string")
    once = df.select(title_case("s").alias("t"))
    twice = once.select(title_case("t").alias("t"))
    assert once.collect()[0][0] == twice.collect()[0][0]


# --- round 4: packed event-order key == lexicographic (ts, id) order ---

ts_id_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),              # tight ts range → ties
        # FULL signed-int64 id space, negatives included: the r04 advisor
        # showed a 10^19 stride misorders mixed-sign ids across adjacent
        # timestamps (pack(T, 9.2e18) > pack(T+1µs, −9.2e18)); the stride
        # is now 2^64 and this strategy must be able to catch a regression
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
    ),
    min_size=2,
    max_size=20,
    unique=True,
)


@SETTINGS
@given(rows=ts_id_rows)
def test_event_order_key_matches_lexicographic(spark, rows):
    """functions.scalar.event_order_key packs (ts, id) into one
    DECIMAL(38,0) so min_by/max_by stay hash-aggregable; the pack must
    order EXACTLY like lexicographic (ts, id) — including timestamp ties,
    which is the whole point of the composite key."""
    from isen_projet_bigdata_a3s6_spark.functions.scalar import event_order_key

    df = spark.createDataFrame(
        [(t, i) for t, i in rows], "t long, event_id long"
    ).withColumn("ts", F.timestamp_seconds(F.col("t")))
    got = [
        (r["t"], r["event_id"])
        for r in df.orderBy(event_order_key("ts", "event_id")).collect()
    ]
    assert got == sorted((t, i) for t, i in rows)

"""Round-6 regression pins: the r05 ADVICE items.

1. plans.guard no longer treats EVERY ``Scan ExistingRDD`` as bounded:
   checkpointed / localCheckpointed frames (the repo's cut_lineage on
   data-sized frames) compile to the same nodeName as driver-literal
   ``createDataFrame`` frames, but only the latter's RDD lineage bottoms
   out in a ParallelCollectionRDD — the guard now probes the origin.
2. plans.guard stops the bounded-side recursion at row-MULTIPLYING nodes:
   an explode over a key-free collect_list aggregate has a 1-row child but
   data-sized output, so a cartesian against it must be flagged.
3. grid-exact 1-NN snapshots the per-round candidate frame before the
   certified/unresolved/no_cand fan-out, so the three derived jobs read
   one materialization — row preservation no longer depends on min_by
   tie-break determinism across independent jobs.
4. haversine grid-exact derives its certification margin from ``round_to``
   (10·10^-round_to) instead of the hardcoded 1e-5, so coarse roundings
   (round_to ≤ 5) keep the "rounded ordering exact" guarantee.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _flags(df):
    from isen_projet_bigdata_a3s6_spark.plans.guard import scale_killer_flags

    return scale_killer_flags(df)


def test_guard_flags_cartesian_against_checkpointed_frame(spark, sf_dir, tmp_path):
    """A localCheckpointed data-sized side renders as Scan ExistingRDD but
    must NOT be exempt — it grows with the data (r05 advisory, medium)."""
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ck = lineitem.select("l_orderkey", "l_partkey").localCheckpoint(eager=True)
    other = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey")
    bad = other.crossJoin(ck.limit(10**9))  # limit keeps Catalyst from folding
    prev = spark.conf.get("spark.sql.crossJoin.enabled", "true")
    spark.conf.set("spark.sql.crossJoin.enabled", "true")
    try:
        assert _flags(bad), "checkpointed fact side exempted from cartesian guard"
    finally:
        spark.conf.set("spark.sql.crossJoin.enabled", prev)


def test_guard_still_exempts_driver_literal_frame(spark, sf_dir):
    """createDataFrame rows crossed the py4j bridge from the driver — that
    side is bounded by construction and stays exempt. The explicit
    broadcast hint mirrors the repo's literal-cross-join pattern (ExistingRDD
    has unknown stats, so without the hint Catalyst broadcasts the OTHER
    side — which the guard then rightly flags)."""
    lit = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    fact = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey")
    prev = spark.conf.get("spark.sql.crossJoin.enabled", "true")
    spark.conf.set("spark.sql.crossJoin.enabled", "true")
    try:
        assert _flags(fact.crossJoin(F.broadcast(lit))) == []
    finally:
        spark.conf.set("spark.sql.crossJoin.enabled", prev)


def test_guard_flags_generate_over_keyfree_collect_list(spark, sf_dir):
    """collect_list with no keys → 1 row; exploding it right back out
    restores data-sized cardinality, so the 'bounded' certificate must not
    survive the Generate (r05 advisory, low)."""
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    packed = lineitem.agg(F.collect_list("l_orderkey").alias("ks"))
    unpacked = packed.select(F.explode("ks").alias("k"))
    fact = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey")
    prev = spark.conf.get("spark.sql.crossJoin.enabled", "true")
    spark.conf.set("spark.sql.crossJoin.enabled", "true")
    try:
        assert _flags(fact.crossJoin(unpacked)), (
            "explode-over-global-collect_list passed the bounded-side guard"
        )
    finally:
        spark.conf.set("spark.sql.crossJoin.enabled", prev)


def test_guard_exempts_explode_of_literal(spark, sf_dir):
    """Exploding a plan constant stays a plan constant — literal-subtree
    Generates remain exempt."""
    lit = spark.createDataFrame([([1, 2, 3],)], "xs array<int>")
    exploded = lit.select(F.explode("xs").alias("x"))
    fact = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey")
    prev = spark.conf.get("spark.sql.crossJoin.enabled", "true")
    spark.conf.set("spark.sql.crossJoin.enabled", "true")
    try:
        assert _flags(fact.crossJoin(F.broadcast(exploded))) == []
    finally:
        spark.conf.set("spark.sql.crossJoin.enabled", prev)


def test_grid_exact_row_preserving_without_tiebreak(spark):
    """tiebreak=None with exact-tie candidates at the certify boundary:
    the snapshot before the fan-out guarantees one output row per probe
    (pre-fix, independent min_by jobs could duplicate or drop a probe)."""
    from isen_projet_bigdata_a3s6_spark.operators.joins import (
        knn_join_1nn_grid_exact,
    )

    # probes at cell centers; two known points exactly equidistant from
    # each probe and right at the certification radius
    probes = spark.createDataFrame(
        [(i, float(i * 10), 0.0) for i in range(40)], "pid int, x double, y double"
    )
    known = spark.createDataFrame(
        [(i * 10 - 1.0, 0.0, f"L{i}") for i in range(40)]
        + [(i * 10 + 1.0, 0.0, f"R{i}") for i in range(40)],
        "kx double, ky double, lbl string",
    )
    out = knn_join_1nn_grid_exact(
        probes, known, "pid", ("x", "y"), ("kx", "ky"),
        payload_cols=["lbl"], cell_size=1.0, tiebreak=None,
    )
    pdf = out.toPandas()
    assert len(pdf) == 40
    assert pdf["pid"].is_unique


def test_haversine_grid_exact_coarse_round_to_matches_broadcast(spark):
    """round_to=3 (rounding step 1e-3 km ≫ the old 1e-5 margin): the
    derived margin keeps grid-exact identical to the broadcast path."""
    import random

    from isen_projet_bigdata_a3s6_spark.operators.joins import (
        haversine_knn_1nn,
        haversine_knn_1nn_grid_exact,
    )

    rng = random.Random(11)
    probes = spark.createDataFrame(
        [(i, rng.uniform(44.0, 46.0), rng.uniform(2.0, 5.0)) for i in range(120)],
        "pid int, lat double, lon double",
    )
    known = spark.createDataFrame(
        [(j, rng.uniform(44.0, 46.0), rng.uniform(2.0, 5.0)) for j in range(80)],
        "kid int, klat double, klon double",
    )
    kwargs = dict(
        probe_id="pid",
        probe_latlon=("lat", "lon"),
        known_latlon=("klat", "klon"),
        payload_cols=["kid"],
        tiebreak="kid",
        round_to=3,
    )
    grid = haversine_knn_1nn_grid_exact(
        probes, known, cell_deg=0.3, **kwargs
    ).toPandas().sort_values("pid").reset_index(drop=True)
    bcast = haversine_knn_1nn(probes, known, **kwargs).toPandas().sort_values(
        "pid"
    ).reset_index(drop=True)
    assert list(grid["kid"]) == list(bcast["kid"])
    assert list(grid["d_km"]) == list(bcast["d_km"])

"""Pins for the scale-probe toolchain (tools/scale_probe.py, tools/upscale.py).

These are dev tools, but their invariants guard real conclusions: a wrong
per-copy key stride silently collapses join shards into cross-copy matches
and the sf1 probe then measures a fixture bug, not the engine.
"""

from __future__ import annotations

import string
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import duckdb  # noqa: E402

from scale_probe import data_ratio  # noqa: E402
from upscale import KEYED, STRIDE, rotated_alphabet  # noqa: E402


def test_data_ratio_parses_sf_suffixes():
    assert data_ratio("/root/testdata/sf0.01", "/root/testdata/sf0.1") == 10.0
    assert data_ratio("/root/testdata/sf0.1/", "/tmp/a3s6_scale/sf1") == 10.0


def test_rotation_identity_at_zero_and_bijective():
    src, dst0 = rotated_alphabet(0)
    assert src == dst0 == string.ascii_lowercase + string.ascii_uppercase
    for i in (1, 7, 25):
        src_a, dst_a = rotated_alphabet(i)
        assert len(src_a) == len(dst_a) == 52
        assert sorted(dst_a) == sorted(src_a)  # permutation: no char merges
        # case preserved: lowercase maps to lowercase, uppercase to uppercase
        assert dst_a[:26].islower() and dst_a[26:].isupper()


def test_rotation_preserves_length_and_nonletters():
    src_a, dst_a = rotated_alphabet(3)
    table = str.maketrans(src_a, dst_a)
    s = "Hello, World 42!\n"
    t = s.translate(table)
    assert len(t) == len(s)
    assert t != s
    assert all(t[i] == s[i] for i, c in enumerate(s) if not c.isalpha())


def test_stride_clears_every_real_key(sf_dir):
    """STRIDE must exceed every key in the LARGEST real fixture, else copy
    shards overlap and joins match across copies."""
    for tbl, keys in KEYED.items():
        path = f"/root/testdata/sf0.1/{tbl}.parquet"
        for col in keys:
            mx = duckdb.sql(f"SELECT MAX({col}) FROM '{path}'").fetchone()[0]
            assert mx is not None and mx < STRIDE, (tbl, col, mx)


def test_knuth_hash_survives_int64_scale_keys(spark):
    """The multiplicative-hash family must accept EVERY int64 key: a plain
    long multiply overflows once key * 2654435761 passes 2^63 (keys
    ~3.4e9 — well inside 100 TB id ranges; the sf1 upscale fixture's 2^40
    stride crashed the whole bench under ANSI mode). The DECIMAL(38,0)
    path must agree with exact big-int arithmetic."""
    from isen_projet_bigdata_a3s6_spark.operators.sampling import (
        stratified_exact_k,
        stratified_mod_sample,
    )

    keys = [1, 3_400_000_000, 1 << 40, (1 << 40) * 9 + 12345, (1 << 62) + 7]
    df = spark.createDataFrame([(k, "a") for k in keys], "id long, s string")
    # exact membership per Python big-int arithmetic (no overflow possible)
    expected = {k for k in keys if (k * 2654435761) % 10_000 < 5_000}
    got = {
        r.id
        for r in stratified_mod_sample(df, "id", "s", {"a": 0.5}).collect()
    }
    assert got == expected
    # exact-k ordering on huge keys: picks the k smallest hash buckets
    order = sorted(keys, key=lambda k: ((k * 2654435761) % 10_000, k))
    got_k = {r.id for r in stratified_exact_k(df, "id", "s", k=2).collect()}
    assert got_k == set(order[:2])


def test_split_and_fold_queries_survive_huge_keys(spark, tmp_path):
    """q195's split hash and q167's fold hash are the same formula inline —
    pin them on a fixture whose ids sit at the sf1 shard stride."""
    import pyspark.sql.functions as F

    keys = [(1 << 40) + 5, (1 << 40) * 7 + 2, 42]
    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    h = (
        (F.col("doc_id").cast("decimal(38,0)") * F.lit(2654435761)) % 10000 + 10000
    ) % 10000
    out = {r.doc_id: r.h for r in df.select("doc_id", h.cast("long").alias("h")).collect()}
    for k in keys:
        assert out[k] == (k * 2654435761) % 10_000


def test_streaming_stages_directory_tables(spark, tmp_path):
    """Every real deployment's table is a Spark-written DIRECTORY, not the
    driver fixtures' single file: the file-stream staging must link the
    part-files in (a symlinked directory streams ZERO files — the sf1
    smoke's q192 failure) and the sink read-back must survive with an
    explicit schema."""
    from isen_projet_bigdata_a3s6_spark.streaming.windows import (
        streaming_dedup_keys,
    )

    src = spark.createDataFrame(
        [(i, f"u{i % 3}", "click") for i in range(30)],
        "event_id long, user_id string, event_type string",
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"]).expr(
        "timestamp_micros(1700000000000000 + event_id * 1000000)"
    ))
    d = str(tmp_path / "events_dir.parquet")
    src.repartition(4).write.parquet(d)  # multi-file directory table
    out = streaming_dedup_keys(spark, d, keys=["user_id", "event_type"])
    got = {(r.user_id, r.event_type) for r in out.collect()}
    assert got == {(f"u{i}", "click") for i in range(3)}


def test_stage_parquet_files_rejects_empty_dir(tmp_path):
    from isen_projet_bigdata_a3s6_spark.scratch import stage_parquet_files

    src = tmp_path / "empty_table.parquet"
    src.mkdir()
    stage = tmp_path / "stage"
    stage.mkdir()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no parquet data files"):
        stage_parquet_files(str(src), str(stage))

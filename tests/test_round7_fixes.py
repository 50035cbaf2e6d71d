"""Pins for the round-7 hardening fixes (r06 VERDICT items 2/4, ADVICE).

- containment_prefix_pairs ceil-boundary completeness: 0.85*40 evaluates
  to 34.000000000000004 in doubles; a bare F.ceil read 35 and could prune
  a pair whose containment sits exactly at threshold (ADVICE medium).
- bench.py foreign-JVM contention detection (VERDICT item 4).
- scale_smoke --budget space-separated form (ADVICE).
- write_zordered normalize mode with an all-NULL coordinate column and
  NULL-keyed rows (ADVICE).
- q274 Bradley-Terry sparse vectorized MM (VERDICT item 2) — score parity
  is pinned in tests/test_wave23.py; here we pin the empty-matrix path.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_containment_keeps_exact_threshold_boundary_pair(spark):
    """|A|=40, |B|=34, overlap 34 → containment(A→B) = 34/40 = 0.85
    exactly at threshold. A's 6 unshared tokens are the globally rarest
    (df=1 vs df=4), so without the 1e-9 ceil slack A's prefix held ONLY
    unshared tokens (len 6 instead of 7) and the pair was silently
    dropped before the exact verify — the ADVICE false-negative class."""
    from isen_projet_bigdata_a3s6_spark.functions.dedup import (
        containment_prefix_pairs,
    )

    shared = [f"s{i:02d}" for i in range(34)]
    rare = [f"rareword{i}" for i in range(6)]
    docs = [
        ("A", " ".join(shared + rare)),
        ("B", " ".join(shared)),
        ("F1", " ".join(shared)),
        ("F2", " ".join(shared)),
    ]
    df = spark.createDataFrame(docs, "id string, body string")
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_prefix_pairs(
            df, "id", "body", threshold=0.85, ngram=None
        ).collect()
    }
    assert ("A", "B") in got, "exact-threshold pair pruned by ceil rounding"
    assert abs(got[("A", "B")] - 0.85) < 1e-12
    # the full ordered ≥0.85 set: A→{B,F1,F2} at 0.85, and every ordered
    # pair whose LEFT side is fully contained (the shared-34 docs toward
    # anything, at 1.0) — completeness, not just the pin
    expect = {("A", x) for x in ("B", "F1", "F2")} | {
        (a, b)
        for a in ("B", "F1", "F2")
        for b in ("A", "B", "F1", "F2")
        if a != b
    }
    assert set(got) == expect


def test_jaccard_prefix_slack_preserves_exactness(spark):
    """The shared prefix-length edit (ceil slack) must keep
    jaccard_prefix_pairs exact and complete against brute force on a
    small mixed corpus."""
    from isen_projet_bigdata_a3s6_spark.functions.dedup import (
        jaccard_prefix_pairs,
    )

    vocab = [f"w{i:02d}" for i in range(30)]
    docs = [
        ("d1", " ".join(vocab[:20])),
        ("d2", " ".join(vocab[1:21])),
        ("d3", " ".join(vocab[:17] + vocab[25:28])),
        ("d4", " ".join(vocab[10:30])),
        ("d5", " ".join(vocab[:20])),
    ]
    df = spark.createDataFrame(docs, "id string, body string")
    t = 0.85
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_prefix_pairs(
            df, "id", "body", threshold=t, ngram=None
        ).collect()
    }
    sets = {i: set(b.split()) for i, b in docs}
    ids = sorted(sets)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            j = inter / len(sets[a] | sets[b])
            if j >= t:
                expect[(a, b)] = j
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert abs(got[k] - v) < 1e-9


def test_bench_detects_own_jvm_as_ours(spark):
    """_spark_jvms must tag THIS session's driver JVM as ours (it is a
    child of the test process), so a solo bench run reads contended=False
    even while its own JVM is alive."""
    import bench

    jvms = bench._spark_jvms()
    assert any(ours for _, ours in jvms), "own driver JVM not found/tagged"
    assert isinstance(bench._foreign_spark_jvms(), int)
    assert bench._foreign_spark_jvms() == sum(
        1 for _, ours in jvms if not ours
    )


def test_scale_smoke_budget_both_forms():
    from scale_smoke import parse_argv

    assert parse_argv([]) == ("/tmp/a3s6_scale/sf1", 3600.0)
    assert parse_argv(["/x/sf1", "--budget=120"]) == ("/x/sf1", 120.0)
    assert parse_argv(["/x/sf1", "--budget", "120"]) == ("/x/sf1", 120.0)
    assert parse_argv(["--budget", "90", "/y/sf2"]) == ("/y/sf2", 90.0)
    with pytest.raises(SystemExit):
        parse_argv(["--budget"])  # missing value
    with pytest.raises(SystemExit):
        parse_argv(["/x", "/y"])  # stray positional (the old silent bug)
    with pytest.raises(SystemExit):
        parse_argv(["--bugdet=5"])  # typo'd flag must not be absorbed


def test_zordered_all_null_column_degrades(spark, tmp_path):
    from isen_projet_bigdata_a3s6_spark.sources.writers import write_zordered

    df = spark.createDataFrame(
        [(i, None) for i in range(50)], "a long, b long"
    )
    path = str(tmp_path / "znull")
    write_zordered(df, path, "a", "b", normalize=True)  # must not raise
    assert spark.read.parquet(path).count() == 50


def test_zordered_null_rows_keep_all_rows(spark, tmp_path):
    """Rows with a NULL coordinate get the explicit -1 z-key: they are
    written (never dropped) and the non-NULL rows still arrive
    z-clustered."""
    from isen_projet_bigdata_a3s6_spark.sources.writers import write_zordered

    rows = [(i, i * 3 if i % 7 else None) for i in range(200)]
    df = spark.createDataFrame(rows, "a long, b long")
    path = str(tmp_path / "znullrows")
    write_zordered(df, path, "a", "b", normalize=True)
    back = spark.read.parquet(path)
    assert back.count() == 200
    assert back.filter(F.col("b").isNull()).count() == sum(
        1 for _, b in rows if b is None
    )


def test_bradley_terry_empty_corpus(spark, tmp_path):
    """Sparse-MM rework edge: a lineitem slice with no competing
    suppliers (every part single-sourced) yields an empty, schema-correct
    result instead of a numpy shape error."""
    from isen_projet_bigdata_a3s6_spark import queries as Q

    sf = str(tmp_path)
    spark.createDataFrame(
        [(1, 10, 5.0, 100.0), (2, 11, 2.0, 40.0)],
        "l_partkey long, l_suppkey long, l_quantity double, "
        "l_extendedprice double",
    ).write.parquet(f"{sf}/lineitem.parquet")
    out = Q._QUERIES["q274_bradley_terry"](spark, sf)
    assert out.columns == ["supplier", "games", "wins", "bt_score"]
    assert out.count() == 0

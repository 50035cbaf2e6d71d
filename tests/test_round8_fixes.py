"""Pins for the round-8 hardening fixes (r07 ADVICE items + VERDICT item 4).

- dedup ceil slack made RELATIVE (1e-9·sz): the absolute 1e-9 stops
  covering half-an-ULP of the product once t·sz reaches ~2^24, so the
  exact-integer-boundary false-negative class could reappear for
  documents with tens of millions of distinct tokens (ADVICE low).
- scale_smoke --budget with a non-numeric value: clean SystemExit, not a
  raw float() traceback (ADVICE low).
- bench.py mid-run contention sampling + per-query rep-spread fields
  (ADVICE low + VERDICT item 4).
- q274 docstring no longer claims bit-identical scores (ADVICE low).
"""

from __future__ import annotations

import math
import os
import sys
from fractions import Fraction

import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_relative_slack_covers_large_products():
    """Mirror of the Spark-side ceil expressions in IEEE doubles.

    Ground truth: the DECIMAL threshold the caller wrote (k/100 as an
    exact rational) — the double carries up to 2^-53 relative
    representation error, and the product another half-ULP, so once
    t·sz reaches the tens of millions the combined excess above an
    exact-integer boundary can exceed an absolute 1e-9 and the bare
    ``ceil(t·sz − 1e-9)`` reads one too high (prefix one too short →
    silent false negative). These (t, sz) pairs were found by exhaustive
    scan over k/100 thresholds and sz < 8e7 and FAIL under the absolute
    slack; the relative 1e-9·sz slack must read the exact ceiling."""
    # (threshold, sz, exact decimal ceil) — each a real absolute-slack
    # failure: ceil(t*sz - 1e-9) == exact+1
    cases = [
        (0.54, 52_428_850, 28_311_579),
        (0.55, 41_943_060, 23_068_683),
        (0.56, 34_952_550, 19_573_428),
        (0.67, 46_603_400, 31_224_278),
        (0.68, 38_130_050, 25_928_434),
        (0.81, 34_952_600, 28_311_606),
    ]
    for t, s, exact in cases:
        # confirm the decimal ground truth and the absolute-slack failure
        assert Fraction(str(t)) * s == exact
        assert math.ceil(t * s - 1e-9) == exact + 1, (
            f"premise void at t={t}, sz={s}: absolute slack no longer fails"
        )
        assert math.ceil(t * s - 1e-9 * s) == exact
    # keep-side safety sweep: the relative slack may read LOW (longer
    # prefix, extra candidates the exact verify discards) but never HIGH,
    # and in the realistic ≤1e8-token regime at most 1 below exact
    t = 0.85
    tf = Fraction("0.85")
    for sz in range(1, 4000):
        for s in (sz, sz + 16_777_216, sz + 67_108_864):
            exact = -((-tf * s) // 1)
            rel = math.ceil(t * s - 1e-9 * s)
            assert exact - 1 <= rel <= exact, (sz, s, rel, exact)


def test_jaccard_exactness_survives_relative_slack(spark):
    """Re-pin exactness/completeness of jaccard_prefix_pairs against brute
    force after the slack terms changed from absolute to relative."""
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
        # exact-threshold boundary pair: |∩|=34 impossible at vocab 30, so
        # add the 0.85×40 shape inline (the round-7 corpus)
        ("a", " ".join([f"s{i:02d}" for i in range(34)] + [f"r{i}" for i in range(6)])),
        ("b", " ".join([f"s{i:02d}" for i in range(34)] + [f"q{i}" for i in range(6)])),
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


def test_containment_boundary_survives_relative_slack(spark):
    """Round-7 boundary corpus re-pinned on the relative-slack expressions:
    containment(A→B) = 34/40 = 0.85 exactly at threshold must survive."""
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
        (r["id_a"], r["id_b"])
        for r in containment_prefix_pairs(
            df, "id", "body", threshold=0.85, ngram=None
        ).collect()
    }
    assert ("A", "B") in got, "exact-threshold pair pruned by ceil rounding"


def test_scale_smoke_budget_non_numeric_is_clean_exit():
    from scale_smoke import parse_argv

    for argv in (["--budget", "abc"], ["--budget=abc"], ["--budget="]):
        with pytest.raises(SystemExit) as ei:
            parse_argv(argv)
        assert "number" in str(ei.value)
    # numeric forms still parse
    assert parse_argv(["--budget", "1e3"]) == ("/tmp/a3s6_scale/sf1", 1000.0)


def test_bench_midrun_probe_and_spread_fields():
    """Source-level pin (the timed loop needs a live 40-query bench run to
    exercise functionally): the mid-run foreign-JVM samples must feed the
    contended flag, and the output line must carry the best_of/spread
    fields the r07 verdict asked for."""
    src = open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench.py",
        )
    ).read()
    assert "foreign_mid = foreign_mid or bool(_foreign_spark_jvms())" in src
    assert "foreign_pre or foreign_mid or _foreign_spark_jvms()" in src
    for field in ('"best_of"', '"spread_p50"', '"spread_p90"'):
        assert field in src, f"bench output line missing {field}"


def test_affine_cms_upper_and_lower_bounds(spark):
    """The affine hash family must keep the CMS guarantees: every point
    estimate ≥ its true count (one-sided), and ≤ true + N/width with
    margin (the e/width bound holds per-row w.h.p.; depth=4 mins make a
    violation at this width astronomically unlikely on 6k rows)."""
    from isen_projet_bigdata_a3s6_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )
    from isen_projet_bigdata_a3s6_spark.sources.readers import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    cms = cms_build(li, "l_partkey", width=1024, depth=4, hash_family="affine")
    keys = li.filter("l_partkey < 50").select("l_partkey")
    est = {
        r["l_partkey"]: r["est"]
        for r in cms_estimate(
            cms, keys, "l_partkey", width=1024, depth=4, hash_family="affine"
        ).collect()
    }
    exact = {
        r["l_partkey"]: r["n"]
        for r in li.filter("l_partkey < 50")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_total = li.count()
    assert set(est) == set(exact)
    for k, e in est.items():
        assert e >= exact[k], f"CMS under-counted key {k}"
        assert e <= exact[k] + n_total / 1024 * 8, f"CMS blew the bound at {k}"


def test_affine_params_deterministic_and_in_range():
    from isen_projet_bigdata_a3s6_spark.operators.sketches import (
        _CMS_PRIME,
        _affine_params,
    )

    seen = set()
    for i in range(16):
        a, b = _affine_params(42, i)
        assert 1 <= a < _CMS_PRIME
        assert 0 <= b < _CMS_PRIME
        assert _affine_params(42, i) == (a, b)
        seen.add((a, b))
    assert len(seen) == 16, "hash rows must differ per depth"


def test_r08_oracle_promotions_registered():
    """q38/q151/q271/q280 moved from rows-only to oracle-paired this
    round — pin the registration so a refactor can't silently drop them
    back."""
    from isen_projet_bigdata_a3s6_spark import queries

    osql = queries.oracle_sql()
    for name in (
        "q38_minhash_pairs",
        "q39_simhash_pairs",
        "q151_cms_estimate",
        "q271_file_provenance",
        "q280_grid_dbscan",
    ):
        assert name in osql, f"{name} lost its oracle"
    assert "filename=true" in osql["q271_file_provenance"]
    assert "WITH RECURSIVE" in osql["q280_grid_dbscan"]
    assert "md5" in osql["q38_minhash_pairs"]
    assert "bit_count" in osql["q39_simhash_pairs"]


def test_simhash_md5_affine_semantics(spark):
    """The 60-bit md5_affine simhash must keep simhash semantics: exact
    duplicates at Hamming 0, near-dups (one word changed) within the
    max_hamming=3 gate or correctly outside it, and an unrelated doc
    never paired at distance ≤3."""
    from isen_projet_bigdata_a3s6_spark.functions.dedup import (
        simhash_dedup_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog " * 3
    docs = [
        (1, base),
        (2, base),
        (3, "completely unrelated text about database engines and sql"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_dedup_pairs(
            df, "text", "doc_id", max_hamming=3, hash_family="md5_affine"
        ).collect()
    }
    assert got.get((1, 2)) == 0, f"exact dup not at hamming 0: {got}"
    assert (1, 3) not in got and (2, 3) not in got


def test_md5_base_hash_cross_engine_parity(spark):
    """The md5_affine minhash family stands on one premise: Spark's
    conv(substr(md5(s),1,15),16,10) equals DuckDB's
    CAST('0x'||substr(md5(s),1,15) AS BIGINT) for any string. Pin it on
    unicode, whitespace, emoji, and the empty string."""
    import duckdb

    from isen_projet_bigdata_a3s6_spark.functions.dedup import _md5_base_hash

    samples = ["hello", "héllo wörld", "a b  c", " x ", "😀emoji", "", "π≈3"]
    df = spark.createDataFrame([(s,) for s in samples], "s string").select(
        "s", _md5_base_hash("s").alias("h")
    )
    got = {r["s"]: r["h"] for r in df.collect()}
    con = duckdb.connect()
    for s in samples:
        want = con.execute(
            "SELECT CAST(concat('0x', substr(md5(?),1,15)) AS BIGINT)", [s]
        ).fetchone()[0]
        assert got[s] == want, f"hash mismatch for {s!r}"


def test_minhash_md5_affine_same_shape_as_default(spark):
    """The md5_affine family must keep minhash semantics: identical pair
    KEYS come out for a corpus of exact duplicates (est 1.0 regardless of
    family), and signatures are deterministic across invocations."""
    from isen_projet_bigdata_a3s6_spark.functions.dedup import (
        minhash_dedup_pairs,
        minhash_signatures,
    )

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "a completely different document about spark sql"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for fam in ("xxhash64", "md5_affine"):
        pairs = {
            (r["id_a"], r["id_b"]): r["jaccard_est"]
            for r in minhash_dedup_pairs(
                df, "text", "doc_id", num_hashes=32, bands=8,
                threshold=0.5, hash_family=fam,
            ).collect()
        }
        assert pairs == {(1, 2): 1.0}, f"family {fam}: {pairs}"
    s1 = minhash_signatures(
        df, "text", "doc_id", 32, 5, "md5_affine"
    ).collect()
    s2 = minhash_signatures(
        df, "text", "doc_id", 32, 5, "md5_affine"
    ).collect()
    assert sorted(map(str, s1)) == sorted(map(str, s2))


def test_scale_trend_argv_contract():
    from scale_trend import parse_argv

    small, large, names, budget = parse_argv(
        ["/a/sf1", "/b/sf3", "q136_pagerank,q267_hits", "--budget", "900"]
    )
    assert (small, large, budget) == ("/a/sf1", "/b/sf3", 900.0)
    assert names == ["q136_pagerank", "q267_hits"]
    with pytest.raises(SystemExit):
        parse_argv(["/a", "/b"])  # missing names
    with pytest.raises(SystemExit):
        parse_argv(["/a", "/b", "not_a_query"])  # unknown query name
    with pytest.raises(SystemExit):
        parse_argv(["/a", "/b", "q136_pagerank", "--budget", "abc"])


def test_q274_docstring_matches_pinned_tolerance():
    from isen_projet_bigdata_a3s6_spark import queries

    doc = queries.q274_bradley_terry.__doc__
    assert "last-ulp-identical" not in doc
    assert "1e-4" in doc

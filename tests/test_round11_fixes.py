"""Round-11 VERDICT/ADVICE fixes.

1. q263's r2 column joined the signed-zero display convention (round_disp
   engine-side, ROUND + 0e0 oracle-side): r2 is >= 0 in exact math but
   float cancellation in its denominator can produce -0.0 after ROUND.
2. q169's oracle now filters on the ROUNDED z (the old outer WHERE bound to
   the inner unrounded z, so an unrounded z in (1.8, 1.8000005) was kept by
   DuckDB and dropped by the engine).
3. q14_anti_join is non-vacuous: the build side is date-windowed so real
   orphan customers survive at sf0.01 (both engines used to return 0 rows
   and the driver hash certified emptiness).
4. q202's winnowing fingerprint computes in a BIGINT domain on both
   engines: a non-ASCII codepoint (up to 0x10FFFF) times the top polynomial
   power overflowed INT32 on long multilingual text — previously a
   both-engine fail-fast reject in the unicodews sweep, now a result.
5. oracle_check._normalize sorts float columns by a sign-aware key so two
   frames holding the SAME multiset with both a -0.0 and a 0.0 row pair
   them deterministically (the numeric mergesort treated them as equal keys
   and could pair -0.0 against 0.0 — a spurious local-gate failure).
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from isen_projet_bigdata_a3s6_spark.oracle_check import (
    DRIVER_FIXTURE_ROOT,
    check_query,
    compare_frames,
)
from isen_projet_bigdata_a3s6_spark.queries import oracle_sql, queries


# ---------------------------------------------------------------------------
# 2. q169: the oracle's anomaly filter binds to the ROUNDED statistic
# ---------------------------------------------------------------------------
def test_q169_oracle_filter_binds_to_rounded_z():
    # the knife edge: unrounded z = 1.8000004 rounds to 1.8, which must NOT
    # pass ABS(z) > 1.8. The old oracle shape (alias and WHERE in the same
    # SELECT) bound the predicate to the inner UNROUNDED z and kept the row.
    con = duckdb.connect()
    old_shape = con.execute(
        # alias and WHERE in the same SELECT: the predicate binds to the
        # inner UNROUNDED z, keeps the row, and emits it rounded to 1.8
        "SELECT ROUND(z, 6) + 0e0 AS z FROM (SELECT 1.8000004e0 AS z) "
        "WHERE ABS(z) > 1.8"
    ).fetchall()
    assert old_shape == [(1.8,)]  # the divergence the r10 ADVICE flagged
    new_shape = con.execute(
        """
        SELECT z FROM (
          SELECT ROUND(z, 6) + 0e0 AS z FROM (SELECT 1.8000004e0 AS z)
        ) WHERE ABS(z) > 1.8
        """
    ).fetchall()
    assert new_shape == []  # rounded filter drops it — matches the engine
    # and the registered oracle text actually uses the wrapped shape: the
    # predicate appears AFTER the subquery that rounds
    sql = oracle_sql()["q169_rolling_zscore_anomalies"]
    assert sql.rindex("ABS(z) > 1.8") > sql.rindex("ROUND(z, 6)")
    con.close()


def test_q169_engine_drops_knife_edge_row(spark):
    # engine semantics pinned directly: round-then-filter drops z=1.8000004
    from isen_projet_bigdata_a3s6_spark.functions.scalar import round_disp

    df = spark.createDataFrame([(1.8000004,), (1.8000006,)], "z double")
    kept = (
        df.select(round_disp(F.col("z"), 6).alias("z"))
        .filter(F.abs(F.col("z")) > 1.8)
        .collect()
    )
    assert [r["z"] for r in kept] == [1.800001]


# ---------------------------------------------------------------------------
# 3. q14 is non-vacuous at the driver fixture
# ---------------------------------------------------------------------------
def test_q14_anti_join_non_vacuous_at_driver_fixture(spark):
    r = check_query(spark, "q14_anti_join", DRIVER_FIXTURE_ROOT)
    assert r.ok, r
    assert r.row_count_spark > 0  # the r10 verdict's vacuously-green row


def test_q14_anti_join_orphans_survive_windowing(spark):
    # synthetic pin of the semantics: customer 2 has only a pre-window
    # order, customer 3 has none — both must survive the anti join;
    # customer 1's in-window order removes it
    cust = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20)], "c_custkey long, c_nationkey int"
    )
    orders = spark.createDataFrame(
        [(100, 1, "1995-06-01"), (101, 2, "1993-01-15")],
        "o_orderkey long, o_custkey long, d string",
    ).select("o_orderkey", "o_custkey", F.col("d").cast("date").alias("o_orderdate"))
    win = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("date"))
    )
    got = {
        (r["c_nationkey"], r["n"])
        for r in cust.join(win, cust.c_custkey == win.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == {(10, 1), (20, 1)}


# ---------------------------------------------------------------------------
# 4. q202 BIGINT hash domain: long non-ASCII text fingerprints, not fails
# ---------------------------------------------------------------------------
def test_q202_bigint_domain_handles_high_codepoints(spark, tmp_path):
    # U+10FFFF * 923521 = 1.03e12 — the INT32 overflow the r10 unicodews
    # sweep hit as a both-engine reject. Two near-duplicate long docs with
    # high codepoints sprinkled in must now produce a shared-fingerprint
    # pair on BOTH engines, bit-identically.
    # non-repeating body (a repeated phrase collapses to a handful of
    # DISTINCT fingerprints and cannot reach the shared >= 40 threshold),
    # with a max-codepoint char every 10 words to force the 64-bit domain
    base = " ".join(
        f"w{i}tok" + ("\U0010ffff" if i % 10 == 0 else "") for i in range(400)
    )
    docs = [(1, base + " tail one"), (2, base + " tail two"), (3, "short unrelated")]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    fixture = tmp_path / "docs"
    fixture.mkdir()
    pdf.to_parquet(fixture / "documents.parquet")

    spark_out = (
        queries()["q202_winnowing_fingerprints"](spark, str(fixture))
        .orderBy("doc_a", "doc_b")
        .collect()
    )
    assert len(spark_out) == 1 and spark_out[0]["shared"] >= 40

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{fixture}/documents.parquet')"
    )
    oracle_out = con.execute(
        oracle_sql()["q202_winnowing_fingerprints"]
    ).fetchdf()
    con.close()
    assert compare_frames(
        "q202_adversarial",
        pd.DataFrame([r.asDict() for r in spark_out]),
        oracle_out,
    ).ok


# ---------------------------------------------------------------------------
# 5. comparator: sign-aware row pairing for ±0.0
# ---------------------------------------------------------------------------
def test_compare_frames_pairs_signed_zero_rows_deterministically():
    # same multiset, one -0.0 row and one 0.0 row, presented in OPPOSITE
    # physical orders — the numeric mergesort saw equal keys and could pair
    # -0.0 against 0.0 (spurious fail); the sign-aware key must pass this
    a = pd.DataFrame({"k": [1, 1], "v": [-0.0, 0.0]})
    b = pd.DataFrame({"k": [1, 1], "v": [0.0, -0.0]})
    r = compare_frames("zero_pairing", a, b)
    assert r.ok, r.mismatches


def test_compare_frames_still_flags_real_signed_zero_mismatch():
    # strictness preserved: multisets {-0.0} vs {0.0} must STILL fail —
    # the driver's stringified hash distinguishes them (the r09 q43 class)
    a = pd.DataFrame({"v": [-0.0]})
    b = pd.DataFrame({"v": [0.0]})
    assert not compare_frames("zero_strict", a, b).ok


def test_compare_frames_sign_aware_key_keeps_nan_and_ties_stable():
    # NaN rows and exact-tie rows still pair under the string key
    a = pd.DataFrame({"k": [2, 1, 1], "v": [float("nan"), 3.5, 3.5]})
    b = pd.DataFrame({"k": [1, 2, 1], "v": [3.5, float("nan"), 3.5]})
    assert compare_frames("nan_ties", a, b).ok


# ---------------------------------------------------------------------------
# 1. q263 r2 signed-zero convention (structural pin; value parity is the
#    driver gate's job and check_query covers it in the sweeps)
# ---------------------------------------------------------------------------
def test_q263_r2_uses_display_normalization():
    sql = oracle_sql()["q263_grouped_ols"]
    # every final display ROUND in q263 carries the + 0e0 normalization
    r2_clause = sql[sql.index("AS intercept") :]
    assert "+ 0e0 AS r2" in r2_clause

# ---------------------------------------------------------------------------
# 6. q40/q72 bounded-baseline caps (r10 verdict item 6): the engine's ceil
#    matches the oracle's GREATEST/CEIL at the boundaries, and the cap is a
#    no-op at every driver SF
# ---------------------------------------------------------------------------
def test_bounded_baseline_cap_arithmetic():
    con = duckdb.connect()
    for n, cap, want_k in [
        (500, 6000, 1), (5000, 6000, 1), (6000, 6000, 1), (6001, 6000, 2),
        (50000, 6000, 9), (2000, 2048, 1), (2048, 2048, 1), (2049, 2048, 2),
        (20000, 2048, 10),
    ]:
        eng_k = max(1, -(-n // cap))
        sql_k = con.execute(
            f"SELECT GREATEST(1, CAST(CEIL({n} / {cap}.0) AS BIGINT))"
        ).fetchone()[0]
        assert eng_k == sql_k == want_k, (n, cap, eng_k, sql_k)
    con.close()


def test_q40_q72_cap_is_noop_at_driver_fixture(spark):
    # 500 docs / 500 vectors at sf0.01 → k = 1 on both engines, so the
    # sampled query equals the unsampled library call row-for-row
    from isen_projet_bigdata_a3s6_spark.functions.dedup import (
        embedding_dedup_pairs,
        ngram_jaccard_pairs,
    )
    from isen_projet_bigdata_a3s6_spark.sources.readers import load_table

    d = load_table(spark, DRIVER_FIXTURE_ROOT, "documents")
    direct = ngram_jaccard_pairs(d, "text", "doc_id", ngram=5, threshold=0.3)
    via_q = queries()["q40_ngram_jaccard_pairs"](spark, DRIVER_FIXTURE_ROOT)
    assert direct.exceptAll(via_q).count() == 0
    assert via_q.exceptAll(direct).count() == 0

    e = load_table(spark, DRIVER_FIXTURE_ROOT, "embeddings")
    direct_e = embedding_dedup_pairs(
        e, "embedding", "vec_id", threshold=0.35, exact=True
    )
    via_qe = queries()["q72_embedding_dedup_exact"](spark, DRIVER_FIXTURE_ROOT)
    assert direct_e.exceptAll(via_qe).count() == 0
    assert via_qe.exceptAll(direct_e).count() == 0


# ---------------------------------------------------------------------------
# 7. q67 oracle handles non-ASCII: encode(text) replaces CAST(text AS BLOB)
# ---------------------------------------------------------------------------
def test_q67_oracle_parity_on_non_ascii(spark, tmp_path):
    # the unicodews sweep's last both-engine reject: DuckDB's STRING->BLOB
    # cast refuses non-ASCII, but encode() yields the UTF-8 bytes Spark's
    # F.encode produces — byte length AND md5 must match on full Unicode
    docs = [(1, "héllo wörld"), (2, "日本語テキスト"), (3, "plain ascii"),
            (4, "mixed nbsp and \U0010ffff max")]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    fixture = tmp_path / "docs"
    fixture.mkdir()
    pdf.to_parquet(fixture / "documents.parquet")
    spark_out = pd.DataFrame(
        r.asDict()
        for r in queries()["q67_multimodal_meta"](spark, str(fixture)).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{fixture}/documents.parquet')"
    )
    oracle_out = con.execute(oracle_sql()["q67_multimodal_meta"]).fetchdf()
    con.close()
    assert compare_frames("q67_unicode", spark_out, oracle_out).ok


# ---------------------------------------------------------------------------
# 8. kmeans_lloyd_blocks: batched per-round PQ trainer is bitwise-identical
#    to the per-subspace kmeans_lloyd loop it replaced (q207)
# ---------------------------------------------------------------------------
def test_kmeans_lloyd_blocks_matches_per_subspace_loop(spark):
    import math

    from isen_projet_bigdata_a3s6_spark.ml.kmeans import (
        kmeans_lloyd,
        kmeans_lloyd_blocks,
    )

    # deterministic 40-vector 8-dim corpus, 2 blocks of 4 dims, k=3;
    # includes a duplicated vector (tie) and a constant dim
    rows = [
        (i, [float((i * 7 + j * 3) % 11), float(i % 5), 1.0,
             float((i * i) % 9), float((i + j) % 4), float(i % 3),
             0.5, float((i * 13) % 6)])
        for i in range(40) for j in [i % 2]
    ]
    df = spark.createDataFrame(rows, "vec_id long, emb array<double>")
    old = []
    import pyspark.sql.functions as SF
    for m in range(2):
        sub = df.select("vec_id", SF.slice("emb", m * 4 + 1, 4).alias("sub"))
        old.append(kmeans_lloyd(sub, "sub", "vec_id", k=3, iters=5, dim=4)[1])
    new = kmeans_lloyd_blocks(df, "emb", "vec_id", k=3, iters=5, n_blocks=2, dsub=4)
    assert new is not None
    for om, nm in zip(old, new):
        for oc, nc in zip(om, nm):
            for x, y in zip(oc, nc):
                assert x == y and math.copysign(1.0, x) == math.copysign(1.0, y)


def test_kmeans_lloyd_blocks_empty_and_tiny_corpus(spark):
    from isen_projet_bigdata_a3s6_spark.ml.kmeans import kmeans_lloyd_blocks

    empty = spark.createDataFrame([], "vec_id long, emb array<double>")
    assert kmeans_lloyd_blocks(empty, "emb", "vec_id", 3, 2, 2, 2) is None
    # corpus smaller than k: last seed duplicated, one round is a fixed point
    tiny = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0]), (2, [5.0, 6.0, 7.0, 8.0])],
        "vec_id long, emb array<double>",
    )
    books = kmeans_lloyd_blocks(tiny, "emb", "vec_id", k=3, iters=3,
                                n_blocks=2, dsub=2)
    assert len(books) == 2 and all(len(b) == 3 for b in books)
    assert books[0][0] == [1.0, 2.0] and books[1][1] == [7.0, 8.0]

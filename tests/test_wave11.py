"""Wave-11 operator tests: intra-doc dedup, inverted index + search,
ER blocking, k-anonymity, stream-static enrichment, semantic dedup,
source diversity."""

from pyspark.sql import functions as F

from isen_projet_bigdata_a3s6_spark import queries as Q

SF = "/root/testdata/sf0.001"


def test_q212_intra_doc_dedup_invariants(spark):
    rows = Q.q212_intra_doc_dedup(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.kept_chunks <= r.total_chunks
        assert 0.0 <= r.dup_frac < 1.0
    # chunk math: ceil(tokens/2) chunks per doc
    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("nt")
    )
    nt = {r.doc_id: r.nt for r in d.collect()}
    for r in rows:
        assert r.total_chunks == -(-nt[r.doc_id] // 2)


def test_q212_plan_has_no_shuffle(spark):
    plan = Q.q212_intra_doc_dedup(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure per-row array algebra


def test_q213_inverted_index_postings_sorted(spark):
    rows = Q.q213_inverted_index(spark, SF).collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r.postings_head.split(",")]
        assert ids == sorted(ids)
        assert len(ids) == min(r.df, 8)
        assert r.tf >= r.df >= 2


def test_q214_search_matches_bruteforce(spark):
    got = {r.doc_id for r in Q.q214_index_search(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    want = set()
    for d in docs:
        toks = set(d.text.lower().split())
        if {"spark", "merge", "window"} <= toks:
            want.add(d.doc_id)
    assert got == want


def test_q215_er_blocking_pairs(spark):
    rows = Q.q215_er_blocking(spark, SF).collect()
    for r in rows:
        assert r.name_a < r.name_b
        assert r.name_a.endswith(r.blk) and r.name_b.endswith(r.blk)
        assert 0 < r.dist <= 3  # distinct names can't be at distance 0
        assert r.rows_a >= 1 and r.rows_b >= 1


def test_q216_k_anonymity_groups_risky(spark):
    rows = Q.q216_k_anonymity(spark, SF).collect()
    for r in rows:
        assert 1 <= r.n < 5
    # every reported group really exists in the base table
    c = spark.read.parquet(f"{SF}/customer.parquet")
    total = c.count()
    risky = sum(r.n for r in rows)
    assert 0 < risky <= total


def test_q217_stream_static_matches_batch(spark):
    got = {
        (r.day_start, r.segment): (r.n, round(r.sum_value, 4))
        for r in Q.q217_stream_static_enrich(spark, SF).collect()
    }
    from isen_projet_bigdata_a3s6_spark.sources.readers import load_table

    e = load_table(spark, SF, "events")
    c = load_table(spark, SF, "customer")
    batch = (
        e.join(c, e.user_id == c.c_custkey)
        .groupBy(
            F.date_trunc("day", "ts").alias("day_start"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
        .collect()
    )
    want = {(r.day_start, r.segment): (r.n, round(r.sv, 4)) for r in batch}
    assert got == want


def test_q218_semantic_dedup_keeper_rule(spark):
    rows = Q.q218_semantic_dedup(spark, SF).collect()
    for r in rows:
        assert r.kept_by < r.vec_id  # survivor is always the smaller id
        assert r.n_nbrs >= 1
        assert 0.30 <= r.max_score <= 1.0
    # no vector is simultaneously a keeper target below tau: kept_by must
    # itself share the label (spot-check via base table)
    emb = {
        r.vec_id: r.label
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    for r in rows:
        assert emb[r.kept_by] == r.label == emb[r.vec_id]


def test_q219_source_diversity_bounds(spark):
    rows = Q.q219_source_diversity(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_docs >= 1
        assert -1.0 <= r.min_cos <= r.max_cos <= 1.0
        assert r.min_cos - 1e-9 <= r.avg_cos <= r.max_cos + 1e-9

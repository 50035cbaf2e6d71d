"""Wave-12 operator tests: α-mixture, VARIANT shredding, Python
DataSource, DP noisy counts, unigram-LM tokenizer, tokenizer fertility."""

import math

from pyspark.sql import functions as F

from isen_projet_bigdata_a3s6_spark import queries as Q

SF = "/root/testdata/sf0.001"


def test_q220_alpha_mixture_flattens_head(spark):
    rows = Q.q220_alpha_mixture(spark, SF).collect()
    assert rows
    assert abs(sum(r.alpha_share for r in rows) - 1.0) < 1e-4
    # alpha < 1 compresses the mixture: the head domain's share under
    # alpha must be BELOW its raw token share, the tail's above
    tot = sum(r.n_tokens for r in rows)
    head = max(rows, key=lambda r: r.n_tokens)
    tail = min(rows, key=lambda r: r.n_tokens)
    assert head.alpha_share < head.n_tokens / tot
    assert tail.alpha_share > tail.n_tokens / tot


def test_q221_variant_matches_string_path(spark):
    """variant_get must agree with the classic get_json_object path."""
    got = {r.event_type: (r.n, r.sum_k) for r in Q.q221_variant_shred(spark, SF).collect()}
    e = spark.read.parquet(f"{SF}/events.parquet").filter(F.col("props").isNotNull())
    want = {
        r.event_type: (r.n, r.sum_k)
        for r in e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
        )
        .collect()
    }
    assert got == want


def test_q222_python_datasource_partitions(spark):
    df = Q.q222_python_datasource(spark, SF)
    rows = df.collect()
    assert len(rows) == 16
    assert sum(r.n for r in rows) == 80000
    # closed-form spot check for one bucket
    want = [(i * 48271) % 1000003 for i in range(80000) if i % 16 == 3]
    got = next(r for r in rows if r.bucket == 3)
    assert got.n == len(want)
    assert got.sum_metric == sum(want)
    assert got.min_metric == min(want) and got.max_metric == max(want)


def test_q224_dp_deterministic_and_calibrated(spark):
    a = {(r.source, r.lang): r.noisy_n for r in Q.q224_dp_noisy_counts(spark, SF).collect()}
    b = {(r.source, r.lang): r.noisy_n for r in Q.q224_dp_noisy_counts(spark, SF).collect()}
    assert a == b  # seeded noise: the release is reproducible
    true = {
        (r.source, r.lang): r.n
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(a) == set(true)
    devs = [abs(a[k] - true[k]) for k in true]
    # Laplace(b=1): P(|x| > 20) ~ e^-20 — a deviation beyond that means
    # broken inverse-CDF math, not bad luck
    assert max(devs) <= 20
    # noise must actually be applied somewhere
    assert any(d > 0 for d in devs)


def test_q225_unigram_em_on_tiny_corpus(spark):
    """Hand-checkable corpus: 'abab' repeated — EM must discover 'ab' (or
    a superstring) and the Viterbi segmentation must prefer it over
    char-by-char fallback."""
    from isen_projet_bigdata_a3s6_spark.functions.unigram import unigram_train

    df = spark.createDataFrame(
        [("abab abab ab",), ("abab ab ab",), ("ab abab",)], ["text"]
    )
    out = unigram_train(df, "text", vocab_size=8, max_piece_len=4, iterations=2)
    rows = {r.piece: r for r in out.collect()}
    assert "abab" in rows or "ab" in rows
    # the dominant multi-char piece carries more mass than any single char
    multi = max(
        (r for p, r in rows.items() if len(p) > 1), key=lambda r: r["count"]
    )
    singles = [r for p, r in rows.items() if len(p) == 1]
    assert all(multi["count"] >= s["count"] for s in singles)
    # logprobs normalize: sum of exp(logprob) over the emitted vocab ≈ 1
    z = sum(math.exp(r.logprob) for r in rows.values())
    assert abs(z - 1.0) < 1e-3


def test_q225_runs_on_documents(spark):
    rows = Q.q225_unigram_tokenizer(spark, SF).collect()
    assert len(rows) > 10
    pieces = {r.piece for r in rows}
    assert any(len(p) > 1 for p in pieces)  # EM kept multi-char pieces
    for r in rows:
        assert r.logprob < 0 and r["count"] > 0


def test_q223_fertility_bounds(spark):
    rows = Q.q223_tokenizer_fertility(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.fertility >= 1.0  # BPE-ish splitter never merges words
        assert r.chars_per_token > 0
        assert r.bpe_tokens >= r.ws_tokens

"""Round-3 training-data operators: sequence packing (both disciplines),
Gopher quality rules, incremental dedup, int8 embedding quantization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_concat_chunk_packing_offsets_and_spans(spark):
    from isen_projet_bigdata_a3s6_spark.operators.packing import concat_chunk_packing

    rows = [
        (1, "a b c", "s1"),          # 3 tokens
        (2, "d e f g", "s1"),        # 4
        (3, "h", "s1"),              # 1
        (4, "", "s1"),               # 0 tokens
        (5, "x y z w v", "s2"),      # 5
    ]
    out = {
        r["doc_id"]: r
        for r in concat_chunk_packing(
            _docs(spark, rows), "doc_id", "text", budget=4, group_col="source"
        ).collect()
    }
    # s1 stream: doc1 tokens 0-2 (pack 0), doc2 tokens 3-6 (packs 0-1),
    # doc3 token 7 (pack 1), doc4 empty at offset 8 (pack 2, zero tokens)
    assert (out[1]["tok_offset"], out[1]["pack_start"], out[1]["pack_end"]) == (0, 0, 0)
    assert (out[2]["tok_offset"], out[2]["pack_start"], out[2]["pack_end"]) == (3, 0, 1)
    assert (out[3]["tok_offset"], out[3]["pack_start"], out[3]["pack_end"]) == (7, 1, 1)
    assert (out[4]["tok_offset"], out[4]["pack_start"], out[4]["pack_end"]) == (8, 2, 2)
    # s2 stream starts at offset 0 independently
    assert (out[5]["tok_offset"], out[5]["pack_start"], out[5]["pack_end"]) == (0, 0, 1)


def test_concat_chunk_packing_budget_guard(spark):
    from isen_projet_bigdata_a3s6_spark.operators.packing import concat_chunk_packing

    with pytest.raises(ValueError):
        concat_chunk_packing(_docs(spark, [(1, "a", "s")]), "doc_id", "text", 0)


def test_greedy_pack_semantics(spark):
    from isen_projet_bigdata_a3s6_spark.operators.packing import greedy_pack

    rows = [(i, " ".join(["w"] * (1 + i % 7)), "s") for i in range(80)]
    budget = 10
    out = greedy_pack(
        _docs(spark, rows), "doc_id", "text", budget=budget, num_buckets=4
    ).collect()
    assert len(out) == 80 and len({r["id"] for r in out}) == 80
    by_bucket: dict[int, list] = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for bucket, rs in by_bucket.items():
        rs.sort(key=lambda r: r["id"])
        # independently replay the greedy scan
        cur, fill, packs = 0, 0, {}
        for r in rs:
            n = r["n_tokens"]
            if fill > 0 and fill + n > budget:
                cur, fill = cur + 1, 0
            assert r["pack_id"] == cur, (bucket, r)
            fill += n
            packs.setdefault(cur, 0)
            packs[cur] += n
        # every pack except possibly oversized single docs respects budget
        for pid, tot in packs.items():
            members = [r for r in rs if r["pack_id"] == pid]
            if len(members) > 1:
                assert tot <= budget
        # pack ids contiguous from 0
        assert sorted(packs) == list(range(len(packs)))


def test_greedy_pack_oversized_doc_gets_own_pack(spark):
    from isen_projet_bigdata_a3s6_spark.operators.packing import greedy_pack

    rows = [(1, " ".join(["w"] * 50), "s"), (2, "a b", "s")]
    out = {r["id"]: r for r in greedy_pack(
        _docs(spark, rows), "doc_id", "text", budget=10, num_buckets=1
    ).collect()}
    assert out[1]["pack_id"] != out[2]["pack_id"]


def test_gopher_rules_hand_values(spark):
    from isen_projet_bigdata_a3s6_spark.operators.textstats import (
        gopher_quality_report,
    )

    df = spark.createDataFrame(
        [
            (1, " ".join(["tok"] * 20)),            # dup-heavy: fails dup rule
            (2, " ".join(f"w{i:02d}" for i in range(30))),  # clean: passes
            (3, "one two"),                          # too short
            (4, "   "),                              # zero tokens: reported
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_quality_report(df, "doc_id", "text").collect()}
    assert len(rows) == 4  # zero-token docs are reported, not dropped
    assert rows[1]["n_words"] == 20 and rows[1]["dup_word_frac"] == round(1 - 1 / 20, 6)
    assert rows[1]["passes"] is False
    assert rows[2]["passes"] is True
    assert rows[2]["mean_word_len"] == pytest.approx(3.0)
    assert rows[3]["passes"] is False
    assert rows[4]["n_words"] == 0 and rows[4]["passes"] is False
    assert rows[4]["mean_word_len"] is None


def test_incremental_dedup_drops_known_docs(spark):
    from isen_projet_bigdata_a3s6_spark.functions.text import fingerprint

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "lorem ipsum dolor")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "The  quick brown  fox"),   # normalizes to a corpus doc
            (11, "something genuinely new"),
        ],
        "doc_id long, text string",
    )
    corpus_fp = corpus.select(fingerprint("text").alias("__fp")).distinct()
    kept = (
        new.withColumn("__fp", fingerprint("text"))
        .join(corpus_fp, "__fp", "left_anti")
        .select("doc_id")
        .collect()
    )
    assert [r["doc_id"] for r in kept] == [11]


def test_quantize_int8_roundtrip_error(spark):
    from isen_projet_bigdata_a3s6_spark.functions.similarity import quantize_int8

    rows = [
        (1, [0.5, -1.0, 0.25, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),           # zero vector
        (3, [3.0, -2.0, 1.5, 0.7]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in quantize_int8(df, "embedding", "vec_id").collect()}
    assert out[2]["scale"] == 0.0 and list(out[2]["qvec"]) == [0, 0, 0, 0]
    for vid, vec in [(1, rows[0][1]), (3, rows[2][1])]:
        scale, q = out[vid]["scale"], list(out[vid]["qvec"])
        assert all(-127 <= x <= 127 for x in q)
        # dequantization error bounded by half a quantization step (+ round6
        # slack on the stored scale)
        for orig, qi in zip(vec, q):
            assert abs(qi * scale - orig) <= scale / 2 + 1e-4
        # the max-|v| component hits full range
        assert 127 in (max(q), -min(q))


def test_neardup_clusters_one_canonical_per_cluster(spark, sf_dir):
    from isen_projet_bigdata_a3s6_spark.queries import queries

    out = queries()["q189_neardup_clusters"](spark, sf_dir).collect()
    assert out, "expected non-trivial clusters on the sf0.001 corpus"
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for cluster, members in by_cluster.items():
        canon = [m for m in members if m["is_canonical"]]
        assert len(canon) == 1
        # canonical = lowest doc id, and the cluster label is reachable-min
        assert canon[0]["doc_id"] == min(m["doc_id"] for m in members)
        assert cluster == min(m["doc_id"] for m in members)
    spark.catalog.clearCache()


def test_streaming_dedup_matches_batch_distinct(spark, sf_dir):
    import os

    from isen_projet_bigdata_a3s6_spark.sources.readers import load_table
    from isen_projet_bigdata_a3s6_spark.streaming.windows import streaming_dedup_keys

    got = streaming_dedup_keys(
        spark,
        os.path.join(sf_dir, "events.parquet"),
        keys=["user_id", "event_type"],
        query_name="test_stream_dedup",
    )
    want = load_table(spark, sf_dir, "events").select("user_id", "event_type").distinct()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_quantized_ann_recall_floor(spark, sf_dir):
    from isen_projet_bigdata_a3s6_spark.queries import queries

    rows = queries()["q193_quantized_ann_recall"](spark, sf_dir).collect()
    assert len(rows) == 5
    # int8 quantization perturbs cosines by <~1%; top-10 should be nearly
    # unchanged on any realistic embedding distribution
    assert all(r["recall_at_10"] >= 0.9 for r in rows)

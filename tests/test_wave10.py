"""Wave-10 operator tests: PQ-ANN recall, Zipf fit, lexical richness,
language-ID confusion, compaction."""

import pytest
from pyspark.sql import functions as F

from isen_projet_bigdata_a3s6_spark import queries as Q

SF = "/root/testdata/sf0.001"


def test_q207_pq_ann_recall_floor(spark):
    """ADC over 4-bit PQ codes must retrieve most of the true neighbors:
    recall@10 vs exact L2 search ≥ 0.5 on the test corpus (PQ with 8
    subspaces × 16 centroids is a coarse 8-byte code; 0.5 is a loose
    floor that still catches a broken codebook or LUT indexing)."""
    pq = Q.q207_pq_ann(spark, SF)
    got = {
        (r.query_id, r.neighbor_id) for r in pq.collect()
    }
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    rows = emb.collect()
    by_id = {r.vec_id: r.emb for r in rows}
    hits = total = 0
    for qid in sorted(by_id)[:5]:
        qv = by_id[qid]
        d2 = sorted(
            (sum((a - b) ** 2 for a, b in zip(qv, v)), vid)
            for vid, v in by_id.items()
        )
        truth = {vid for _, vid in d2[:10]}
        pred = {nb for (q, nb) in got if q == qid}
        assert len(pred) == 10
        hits += len(truth & pred)
        total += 10
    assert hits / total >= 0.5


def test_q208_zipf_slope_negative(spark):
    r = Q.q208_zipf_fit(spark, SF).collect()[0]
    assert r.n_types > 0
    assert r.slope < 0  # frequency decreases with rank, always


def test_q209_richness_bounds(spark):
    rows = Q.q209_lexical_richness(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r.ttr <= 1.0
        assert 0 <= r.hapax_frac <= 1.0
        assert r.n_types <= r.n_tokens


def test_q210_confusion_totals(spark):
    rows = Q.q210_langid_confusion(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n for r in rows) == n_docs
    # predictions come only from the marker languages (+ 'und')
    assert {r.predicted for r in rows} <= {"de", "en", "es", "fr", "und"}


def test_q211_compaction_lossless_and_few_files(spark, tmp_path):
    """Compaction must preserve content and actually reduce file count."""
    e = spark.read.parquet(f"{SF}/events.parquet")
    frag = str(tmp_path / "frag")
    compact = str(tmp_path / "compact")
    e.repartition(16).write.mode("overwrite").parquet(frag)
    small = spark.read.parquet(frag)
    small.coalesce(2).write.mode("overwrite").parquet(compact)
    import glob

    n_frag = len(glob.glob(f"{frag}/part-*"))
    n_compact = len(glob.glob(f"{compact}/part-*"))
    assert n_frag == 16
    assert n_compact <= 2
    back = spark.read.parquet(compact)
    assert back.count() == e.count()
    a = e.agg(F.sum("event_id"), F.sum("user_id")).collect()[0]
    b = back.agg(F.sum("event_id"), F.sum("user_id")).collect()[0]
    assert tuple(a) == tuple(b)

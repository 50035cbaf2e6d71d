"""Trees pipeline invariants (SURVEY §5.2 golden checks) + multimodal
plumbing."""

from pyspark.sql import functions as F

from isen_projet_bigdata_a3s6_spark.multimodal import (
    extract_image_features,
    with_media_metadata,
)
from isen_projet_bigdata_a3s6_spark.plans.trees_pipeline import (
    FINAL_COLUMNS,
    clean_trees,
    trees_fixture,
)


def test_clean_trees_invariants(spark):
    raw = trees_fixture(spark, n=300)
    out = clean_trees(raw)
    pdf = out.toPandas()
    # final 20-column schema (Rapport Fonctionnalité 6)
    assert list(pdf.columns) == FINAL_COLUMNS
    assert len(pdf) > 0
    # age capped at 200 for >300 outliers (R_groupe4.R:80)
    assert pdf.age_estim.max() <= 300
    # Gricourt/Griourt filtered (R_groupe4.R:145-146)
    assert not pdf.clc_secteur.isin(["Gricourt", "Griourt"]).any()
    # secteur title-cased (R_groupe4.R:178)
    assert (pdf.clc_secteur.dropna() == pdf.clc_secteur.dropna().str.lower().str.title()).all()
    # no null strings after fills (R_groupe4.R:209)
    for c in ("clc_quartier", "clc_secteur", "villeca", "fk_pied"):
        assert pdf[c].notna().all(), c
    # villeca residuals defaulted (R_groupe4.R:205)
    assert set(pdf.villeca.unique()) <= {"VILLE", "CA", "AUTRE"}
    # stadedev case-normalized (R_groupe4.R:90-91)
    assert not pdf.fk_stadedev.isin(["Adulte", "Jeune"]).any()


def test_media_metadata_and_features(spark):
    rows = [(1, bytearray(b"fake-png-bytes-1")), (2, bytearray(b"other-bytes"))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    meta = with_media_metadata(df).collect()
    assert all(r["media_bytes"] > 0 and len(r["media_sha1"]) == 40 for r in meta)
    feats = extract_image_features(df).collect()
    assert {r["media_id"] for r in feats} == {1, 2}
    assert all(r["width"] == 8 and r["channels"] == 3 for r in feats)
    # deterministic: same bytes → same features
    feats2 = extract_image_features(df).collect()
    assert sorted(map(tuple, feats)) == sorted(map(tuple, feats2))

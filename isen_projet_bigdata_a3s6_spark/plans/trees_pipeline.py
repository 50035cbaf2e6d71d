"""The reference's six-part pipeline (SURVEY §0, §3 E1) over a
reference-shaped ``trees`` table (FIXTURES.md §1).

Reproduces R_groupe4.R Part 1 end-to-end as ONE lazy Spark plan:
empty→null (:45) → distinct (:49) → keyed dedup keep-first (:52) →
null-drops (:55-70) → constant/conditional rewrites (:77-91) → CRS
reprojection (:95-106) → 1-NN imputation of quartier/secteur (:110-142) →
value filters (:145-146) → case normalization (:178) → group-wise fills
(:181-205) → global string fill (:209) → final 20-column projection (:1071).

Where the reference runs 13 sequential filters and two O(n·m) R loops, this
plan is: one pushed-down filter, one auto-dispatched 1-NN per imputed column
(broadcast at the reference's ≤10⁴-row regime, grid-bucketed exact equi-joins
beyond it), and three window/broadcast-join fills — the whole Part 1 is two
shuffles plus broadcasts, independent of row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo import with_wgs84
from ..functions.scalar import outlier_cap, replace_literal, title_case
from ..operators.cleaning import (
    blank_strings_to_null,
    dedup_keep_first,
    drop_null_rows,
    fill_string_nulls,
    groupwise_first_fill,
    groupwise_mode_fill,
)
from ..operators.joins import knn_join_1nn_auto

FINAL_COLUMNS = [
    "clc_quartier", "clc_secteur", "haut_tot", "haut_tronc", "tronc_diam",
    "fk_arb_etat", "fk_stadedev", "fk_port", "fk_pied", "fk_situation",
    "fk_revetement", "age_estim", "fk_prec_estim", "clc_nbr_diag",
    "fk_nomtech", "feuillage", "remarquable", "longitude", "latitude",
    "villeca",
]

NOT_NULL_COLS = [
    "X", "Y", "fk_port", "remarquable", "feuillage", "fk_nomtech",
    "fk_prec_estim", "fk_revetement", "haut_tot", "haut_tronc",
    "tronc_diam", "age_estim",
]


def clean_trees(trees: DataFrame, ingest_order_col: str = "id_arbre") -> DataFrame:
    """Full Part-1 cleaning pipeline; returns the reference's final
    20-column table (Rapport Fonctionnalité 6)."""
    df = blank_strings_to_null(trees)                               # :45
    df = df.distinct()                                              # :49
    df = dedup_keep_first(df, ["X", "Y", "fk_arb_etat"], [ingest_order_col])  # :52
    df = drop_null_rows(df, NOT_NULL_COLS)                          # :55-70
    df = df.withColumn("src_geo", F.lit("Orthophoto"))              # :77
    df = df.withColumn("age_estim", outlier_cap("age_estim", 300, 200))  # :80
    df = df.withColumn(
        "fk_stadedev",
        replace_literal(replace_literal("fk_stadedev", "Adulte", "adulte"), "Jeune", "jeune"),
    )                                                               # :90-91
    df = with_wgs84(df, "X", "Y")                                   # :95-106
    # 1-NN imputation of quartier/secteur from known rows (:110-142).
    # Auto-dispatched: the reference's regime (≤10⁴ known rows) takes the
    # broadcast path, but at dataset scale the same pipeline switches to
    # the grid-bucketed exact 1-NN (pure equi-joins) without caller action —
    # the flagship E1 plan is 100×-safe by default, not by caller choice.
    for col in ("clc_quartier", "clc_secteur"):
        missing = df.filter(F.col(col).isNull()).drop(col)
        known = df.filter(F.col(col).isNotNull())
        imputed = knn_join_1nn_auto(
            missing, known.select("X", "Y", col, ingest_order_col),
            probe_id=ingest_order_col,
            probe_coords=("X", "Y"), known_coords=("X", "Y"),
            payload_cols=[col], tiebreak=ingest_order_col,
        )
        df = known.unionByName(imputed.select(*known.columns))
    df = df.filter(~F.col("clc_secteur").isin("Gricourt", "Griourt"))  # :145-146
    df = df.withColumn("clc_secteur", title_case("clc_secteur"))    # :178
    df = groupwise_first_fill(df, "fk_pied", "clc_secteur", ignore_nulls=True)   # :181-184
    df = groupwise_first_fill(df, "fk_situation", "clc_secteur", ignore_nulls=False)  # :187-190
    df = groupwise_mode_fill(df, "villeca", "clc_quartier", default="AUTRE")     # :194-205
    df = fill_string_nulls(df, "Inconnue")                          # :209
    return df.select(*FINAL_COLUMNS)                                # :1071-1074


def trees_fixture(spark: SparkSession, n: int = 400, seed: int = 7) -> DataFrame:
    """Deterministic synthetic trees table per FIXTURES.md §1 — nulls,
    blanks, exact dups, key dups, and outliers included on purpose."""
    import random

    rng = random.Random(seed)
    quartiers = [
        "Quartier du Centre-Ville", "Quartier de Neuville", "HARLY", "OMISSY",
        "Quartier du faubourg d'Isle", "Quartier du Vermandois",
        "Quartier Remicourt", "Quartier Saint-Jean",
        "Quartier Saint-Martin - Oëstres", "ROUVROY", "Quartier de l'Europe",
    ]
    secteurs = ["SAINT-JEAN", "Saint-Jean", "centre", "Gricourt", "Griourt", "europe", "remicourt"]
    etats = ["EN PLACE", "ABATTU", "SUPPRIMÉ", "Essouché", "Non essouché", "REMPLACÉ"]
    stades = ["jeune", "Jeune", "adulte", "Adulte", "vieux", "sénescent"]
    rows = []
    for i in range(n):
        rows.append(
            {
                "id_arbre": i,
                "X": 700000.0 + rng.random() * 30000,
                "Y": 6960000.0 + rng.random() * 30000,
                "clc_quartier": None if rng.random() < 0.03 else rng.choice(quartiers),
                "clc_secteur": None if rng.random() < 0.03 else rng.choice(secteurs),
                "haut_tot": round(1 + rng.random() * 39, 1),
                "haut_tronc": round(rng.random() * 20, 1),
                "tronc_diam": round(5 + rng.random() * 295, 1),
                "age_estim": float(rng.randint(1, 250)) if rng.random() > 0.02 else float(rng.randint(301, 500)),
                "fk_arb_etat": rng.choice(etats),
                "fk_stadedev": rng.choice(stades),
                "fk_port": f"port_{rng.randint(1, 10)}",
                "fk_pied": None if rng.random() < 0.05 else f"pied_{rng.randint(1, 5)}",
                "fk_situation": None if rng.random() < 0.05 else rng.choice(["Alignement", "Groupe", "Isolé"]),
                "fk_revetement": rng.choice(["Oui", "Non"]),
                "fk_nomtech": f"SP_{rng.randint(1, 40)}",
                "fk_prec_estim": float(rng.randint(1, 10)),
                "clc_nbr_diag": float(rng.randint(0, 5)),
                "feuillage": rng.choice(["Feuillu", "Conifère"]),
                "remarquable": "Oui" if rng.random() < 0.02 else "Non",
                "villeca": None if rng.random() < 0.05 else rng.choice(["VILLE", "CA"]),
                "src_geo": "  " if rng.random() < 0.02 else "GPS",
                "dte_plantation": None,
            }
        )
    # exact duplicates (~1%) and (X, Y, fk_arb_etat) key duplicates (~1%)
    for i in range(n // 100):
        dup = dict(rows[rng.randrange(len(rows))])
        rows.append(dup)
        keydup = dict(rows[rng.randrange(len(rows))])
        keydup["id_arbre"] = n + 1000 + i
        keydup["haut_tot"] = round(1 + rng.random() * 39, 1)
        rows.append(keydup)
    schema = (
        "id_arbre long, X double, Y double, clc_quartier string, clc_secteur string, "
        "haut_tot double, haut_tronc double, tronc_diam double, age_estim double, "
        "fk_arb_etat string, fk_stadedev string, fk_port string, fk_pied string, "
        "fk_situation string, fk_revetement string, fk_nomtech string, "
        "fk_prec_estim double, clc_nbr_diag double, feuillage string, "
        "remarquable string, villeca string, src_geo string, dte_plantation timestamp"
    )
    return spark.createDataFrame(rows, schema)

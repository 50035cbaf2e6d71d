"""The reference's Parts 2-5 analysis queries (R_groupe4.R:282-971) as
engine functions over a cleaned ``trees`` table.

Every chart in the reference is a filter+groupBy+count (SURVEY §2.5 A11);
every map is the same plus a join against a per-area count (J2) and a
threshold bucketing (P9). The rendering is out of engine scope — these
return the DataFrames the charts would plot, so a reference user can run
every query they run today.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import bucketize
from ..operators.aggregations import crosstab_long, group_count, mode_per_group

#: the 11 quartier filter targets (R_groupe4.R:284-535)
QUARTIERS = [
    "Quartier du Centre-Ville", "Quartier de Neuville", "HARLY", "OMISSY",
    "Quartier du faubourg d'Isle", "Quartier du Vermandois",
    "Quartier Remicourt", "Quartier Saint-Jean",
    "Quartier Saint-Martin - Oëstres", "ROUVROY", "Quartier de l'Europe",
]


def counts_by(trees: DataFrame, key: str) -> DataFrame:
    """Global bar charts: counts per fk_stadedev / clc_quartier /
    fk_situation (R_groupe4.R:561-594)."""
    return group_count(trees, [key])


def quartier_breakdown(trees: DataFrame, quartier: str, key: str) -> DataFrame:
    """One per-quartier chart (×11 in the reference, R_groupe4.R:284-557):
    filter to the quartier, count per ``key`` (clc_secteur or fk_nomtech)."""
    return group_count(trees.filter(F.col("clc_quartier") == quartier), [key])


def all_quartier_breakdowns(trees: DataFrame, key: str) -> DataFrame:
    """All 11 charts in ONE pass: groupBy (quartier, key) — the engine
    rewrite of the reference's 11 sequential filter+count scans."""
    return group_count(trees, ["clc_quartier", key])


def remarkable_by_quartier(trees: DataFrame, value: str = "Oui") -> DataFrame:
    """R_groupe4.R:625-631, 957-963."""
    return group_count(trees.filter(F.col("remarquable") == value), ["clc_quartier"])


def stacked_counts(trees: DataFrame, a: str, b: str) -> DataFrame:
    """2-D stacked bars (R_groupe4.R:597-622): long-form 2-key counts."""
    return crosstab_long(trees, a, b)


def secteur_map_buckets(trees: DataFrame) -> DataFrame:
    """Part 3 map query (R_groupe4.R:677-730): per-secteur counts joined
    back + vert/jaune/rouge threshold buckets."""
    counts = group_count(trees, ["clc_secteur"], count_name="nombre")
    return counts.withColumn(
        "couleur",
        bucketize("nombre", [(500.0, "vert"), (1000.0, "jaune")], "rouge"),
    )


def villeca_mode_per_quartier(trees: DataFrame) -> DataFrame:
    """R_groupe4.R:194-198 shape exposed as an analysis query."""
    return mode_per_group(trees, "clc_quartier", "villeca")


def run_report(trees: DataFrame) -> dict[str, DataFrame]:
    """Every Part 2-5 query family, keyed by name — the reference user's
    complete dashboard in one lazy dict."""
    return {
        "stadedev_counts": counts_by(trees, "fk_stadedev"),
        "quartier_counts": counts_by(trees, "clc_quartier"),
        "situation_counts": counts_by(trees, "fk_situation"),
        "secteur_by_quartier": all_quartier_breakdowns(trees, "clc_secteur"),
        "species_by_quartier": all_quartier_breakdowns(trees, "fk_nomtech"),
        "remarkable_by_quartier": remarkable_by_quartier(trees),
        "feuillage_x_villeca": stacked_counts(trees, "feuillage", "villeca"),
        "revetement_x_villeca": stacked_counts(trees, "fk_revetement", "villeca"),
        "secteur_map_buckets": secteur_map_buckets(trees),
        "villeca_mode": villeca_mode_per_quartier(trees),
    }

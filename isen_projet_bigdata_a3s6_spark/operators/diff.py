"""Snapshot diff — row-level change detection between two versions of a
keyed table (the audit/CDC primitive: "what changed between yesterday's
load and today's?").

One full-outer join on the key; change classification is a column-wise
comparison computed as expressions. At 100 TB both sides shuffle once on
the key — if the table is already bucketed/clustered on the key
(``write_bucketed`` / ``write_clustered``), the join co-locates and the
shuffle disappears. Null-safe equality (``<=>``) so NULL→value and
value→NULL count as changes, NULL→NULL does not.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str | list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Classify every key as added / removed / changed (/ unchanged).

    Returns the key columns + ``change_type``. ``compare_cols`` defaults to
    all non-key columns shared by both sides.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in keys]
    o = old.select(keys + compare_cols).alias("o")
    n = new.select(keys + compare_cols).alias("n")
    cond = reduce(
        lambda a, b: a & b, [F.col(f"o.{k}") == F.col(f"n.{k}") for k in keys]
    )
    joined = o.join(n, cond, "full_outer")
    in_old = F.col(f"o.{keys[0]}").isNotNull()
    in_new = F.col(f"n.{keys[0]}").isNotNull()
    same = reduce(
        lambda a, b: a & b,
        [F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")) for c in compare_cols],
        F.lit(True),
    )
    change = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(~same, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(
        *[F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in keys],
        change.alias("change_type"),
    )
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out

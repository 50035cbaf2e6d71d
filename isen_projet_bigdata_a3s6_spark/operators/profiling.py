"""Data-quality constraint checking (Deequ/Great-Expectations shape) —
declare violation-counting aggregate expressions, get back a one-row-per-
check report from a SINGLE aggregation pass over the data.

The report never moves rows: every check is an aggregate (count_if-style),
so a 100 TB table produces one scan + one 1-row aggregate regardless of how
many checks run. Checks that need distinctness ride the same pass via
``count_distinct`` (exact; swap in ``approx_count_distinct`` for a sketch
gate on the largest keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def violations_null(col: str) -> Column:
    """Rows where ``col`` is NULL."""
    return F.count_if(F.col(col).isNull())


def violations_not_in(col: str, allowed: list) -> Column:
    """Rows (NULLs excluded) whose value is outside ``allowed``."""
    return F.count_if(F.col(col).isNotNull() & ~F.col(col).isin(allowed))


def violations_below(col: str, lo) -> Column:
    """Rows strictly below ``lo``."""
    return F.count_if(F.col(col) < F.lit(lo))


def violations_duplicate(*cols: str) -> Column:
    """Excess rows beyond one per distinct key (0 ⇔ key is unique)."""
    return F.count(F.lit(1)) - F.countDistinct(*[F.col(c) for c in cols])


def quality_report(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Run every check in ONE aggregation pass; returns
    ``(check, violations, passed)`` with passed = 1 iff violations = 0.
    ``checks`` maps check name → violation-count aggregate Column."""
    if not checks:
        raise ValueError("quality_report: no checks given")
    agg = df.agg(*[c.cast("long").alias(n) for n, c in checks.items()])
    names = list(checks)
    stack_expr = "stack({}, {}) as (check, violations)".format(
        len(names), ", ".join(f"'{n}', `{n}`" for n in names)
    )
    return agg.select(F.expr(stack_expr)).select(
        "check",
        "violations",
        F.when(F.col("violations") == 0, F.lit(1)).otherwise(F.lit(0)).alias("passed"),
    )

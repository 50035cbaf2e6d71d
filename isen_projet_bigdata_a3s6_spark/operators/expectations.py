"""Declarative data-quality expectation suite — the Deequ/Great-
Expectations capability: a list of column constraints is compiled into ONE
aggregation pass over the table (plus one anti-join per referential
constraint), returning a per-constraint report (status, violation count,
total checked).

Why one pass matters at 100 TB: a naive checker runs one job per
constraint and scans the table N times; compiling every non-relational
constraint into a single ``agg`` means the scan happens once, the partial
aggregates combine map-side, and adding a constraint adds an expression,
not a job. Referential checks are inherently a join, so each one adds a
single anti-join job on the key columns only (column pruning keeps the
shuffle narrow).

Supported kinds (the Deequ core set):
- ``not_null``        — no NULLs in the column
- ``unique``          — no duplicate values (NULLs ignored, like SQL UNIQUE)
- ``in_range``        — numeric value within [lo, hi]
- ``in_set``          — value among the accepted values
- ``matches``         — string matches the regex
- ``references``      — every value exists in another frame's key column
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class Expect:
    kind: str
    column: str
    lo: float | None = None
    hi: float | None = None
    values: list | None = None
    pattern: str | None = None
    ref: DataFrame | None = None
    ref_column: str | None = None
    name: str = field(default="")

    def __post_init__(self):
        if not self.name:
            self.name = f"{self.kind}({self.column})"


def _violation_expr(e: Expect):
    c = F.col(e.column)
    if e.kind == "not_null":
        return F.sum(F.when(c.isNull(), 1).otherwise(0))
    if e.kind == "in_range":
        return F.sum(
            F.when(c.isNotNull() & ((c < e.lo) | (c > e.hi)), 1).otherwise(0)
        )
    if e.kind == "in_set":
        return F.sum(
            F.when(c.isNotNull() & ~c.isin(e.values), 1).otherwise(0)
        )
    if e.kind == "matches":
        return F.sum(
            F.when(
                c.isNotNull() & (F.regexp_count(c, F.lit(e.pattern)) == 0), 1
            ).otherwise(0)
        )
    if e.kind == "unique":
        # duplicates = non-null rows minus distinct non-null values
        return F.sum(F.when(c.isNotNull(), 1).otherwise(0)) - F.count_distinct(c)
    raise ValueError(f"unknown expectation kind: {e.kind}")


def run_suite(df: DataFrame, expectations: list[Expect]) -> DataFrame:
    """Evaluate the suite; returns (constraint, column, violations, total,
    status) with deterministic ordering left to the caller/driver."""
    spark = df.sparkSession
    scan_exprs = [F.count(F.lit(1)).alias("__total")]
    scanned = [e for e in expectations if e.kind != "references"]
    for i, e in enumerate(scanned):
        scan_exprs.append(_violation_expr(e).alias(f"__v{i}"))
    parts: list[DataFrame] = []
    if scanned:
        row = df.agg(*scan_exprs)
        selects = []
        for i, e in enumerate(scanned):
            selects.append(
                F.struct(
                    F.lit(e.name).alias("constraint"),
                    F.lit(e.column).alias("column"),
                    F.coalesce(F.col(f"__v{i}"), F.lit(0))
                    .cast("long")
                    .alias("violations"),
                    F.col("__total").cast("long").alias("total"),
                )
            )
        parts.append(
            row.select(F.explode(F.array(*selects)).alias("r")).select("r.*")
        )
    for e in expectations:
        if e.kind != "references":
            continue
        keys = df.select(F.col(e.column)).filter(F.col(e.column).isNotNull())
        missing = keys.join(
            e.ref.select(F.col(e.ref_column).alias(e.column)).distinct(),
            e.column,
            "left_anti",
        )
        parts.append(
            missing.agg(F.count(F.lit(1)).alias("violations"))
            .crossJoin(df.agg(F.count(F.lit(1)).alias("total")))
            .select(
                F.lit(e.name).alias("constraint"),
                F.lit(e.column).alias("column"),
                F.col("violations").cast("long"),
                F.col("total").cast("long"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "constraint",
        "column",
        "violations",
        "total",
        F.when(F.col("violations") == 0, "pass").otherwise("fail").alias(
            "status"
        ),
    )

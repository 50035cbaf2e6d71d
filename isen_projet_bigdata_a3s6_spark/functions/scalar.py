"""Scalar/column function library (SURVEY §2.9 C1-C7) plus the
oracle-exactness helpers every aggregate query uses.

Reference behaviors covered:
- C1 empty/whitespace string → NULL (``gsub("^\\s*$", NA, x)``, R_groupe4.R:45)
- C2 literal substring replace (R_groupe4.R:90-91)
- C3 case normalization ``str_to_title(tolower(x))`` (R_groupe4.R:178)
- C4 arithmetic: Euclidean distance (R_groupe4.R:113,131)
- C5 conditional scalar: if_else / case_when / coalesce
- C6 date functions (dead code in reference, live here)

Float-exactness convention (``dec_sum``/``dec_avg``): money-like double
sums are computed in DECIMAL (exact, associative → partition-order
independent) then cast to double once. This makes Spark results
bit-identical to the DuckDB oracle AND makes results reproducible across
cluster topologies — at 100 TB a plain double sum differs run-to-run with
partition count; a decimal sum does not.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# oracle-exactness helpers
# --------------------------------------------------------------------------
def dec(col: str | Column, precision: int = 18, scale: int = 4) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dec_sum(col: str | Column, scale: int = 4) -> Column:
    """Exact, order-independent SUM of a money-like double: sum in decimal,
    cast to double once. SQL twin: CAST(SUM(CAST(x AS DECIMAL(28,s))) AS DOUBLE)."""
    return F.sum(dec(col, 28, scale)).cast("double")


def dec_avg(col: str | Column, scale: int = 4) -> Column:
    """Exact mean: decimal sum / non-null count, single double division.
    SQL twin: CAST(SUM(CAST(x AS DECIMAL(28,s))) AS DOUBLE) / COUNT(x)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, 28, scale)).cast("double") / F.count(c)


def event_order_key(ts: str | Column = "ts", id_col: str | Column = "event_id") -> Column:
    """Deterministic total-order key for arg-min/max reductions over event
    rows: ``micros(ts) · 10^12 + id`` packed into one DECIMAL(38,0).

    Why not ``F.struct(ts, id)``: a struct ordering key knocks min_by/max_by
    off the Tungsten hash-aggregate path (struct buffers aren't mutable
    fixed-width), degrading the whole aggregate to Sort+SortAggregate —
    measured on q124's plan. A DECIMAL(38,0) buffer is fixed-width, so the
    aggregate stays a two-phase HashAggregate with ONE exchange.

    Domain: the stride is 2^64 — strictly greater than the WIDTH of the
    signed-int64 id range (id_max − id_min = 2^64 − 1), which is the
    actual ordering-equivalence requirement: pack(T, id_max) =
    T·2^64 + (2^63 − 1) < pack(T+1µs, id_min) = T·2^64 + 2^63. A 10^19
    stride (the previous constant) covers |id| ≤ 9.2e18 but NOT the
    mixed-sign span — pack(T, 9.2e18) would exceed pack(T+1µs, −9.2e18).
    Micros up to the int64-nanos epoch limit (year 2262, ≈9.2e15) keep
    the pack ≤ 1.7e35 ≪ 10^38. Ordering equals (ts, id) lexicographic
    order exactly, for every int64 id including negatives."""
    from decimal import Decimal

    t = F.col(ts) if isinstance(ts, str) else ts
    i = F.col(id_col) if isinstance(id_col, str) else id_col
    # Decimal literal: 2^64 exceeds int64, so a plain int literal cannot
    # cross the py4j bridge
    stride = F.lit(Decimal(2**64))
    return (
        F.unix_micros(t).cast("decimal(38,0)") * stride + i
    ).cast("decimal(38,0)")


def round6(c: Column) -> Column:
    """For genuinely float-path aggregates (corr, stddev, percentile
    interpolation): round to 6 so ~1e-12 accumulation-order noise between
    engines/runs can't flip the value hash."""
    return F.round(c, 6)


def round_disp(c: Column, n: int = 6) -> Column:
    """Display rounding with signed-zero normalization. ROUND of a tiny
    negative yields -0.0 on DuckDB but 0.0 on Spark (BigDecimal HALF_UP
    has no signed zero) — numerically equal, yet the driver's stringifying
    value hash differs (the r09 q43 red row). IEEE -0.0 + 0.0 = +0.0, so
    appending a zero after the round pins both engines to +0.0; every
    other value (incl. NULL/NaN/±inf) is unchanged. Apply to any FINAL
    display column whose rounded value can be negative; the SQL twin is
    ``ROUND(x, n) + 0e0``. Internal round-then-CAST-to-DECIMAL
    quantizations do NOT need this (decimal zero is unsigned on both
    engines), nor do unrounded float columns (identical IEEE ops produce
    identical zero signs cross-engine)."""
    return F.round(c, n) + F.lit(0.0)


# --------------------------------------------------------------------------
# C1-C5 scalar functions
# --------------------------------------------------------------------------
def empty_to_null(col: str | Column) -> Column:
    """C1: blank/whitespace-only string → NULL (R_groupe4.R:45)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.trim(c) == "", F.lit(None)).otherwise(c)


def replace_literal(col: str | Column, find: str, repl: str) -> Column:
    """C2: literal (non-regex) substring replace (R_groupe4.R:90-91)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.replace(c, F.lit(find), F.lit(repl))


def title_case(col: str | Column) -> Column:
    """C3: ``str_to_title(tolower(x))`` (R_groupe4.R:178) — capitalizes after
    any word boundary including '-' and '''  ("saint-jean" → "Saint-Jean").

    Spark's ``initcap`` only breaks on whitespace, so hyphen/apostrophe
    boundaries get a temporary marker+space inserted, then removed after —
    still a pure builtin expression chain."""
    c = F.col(col) if isinstance(col, str) else col
    marked = F.regexp_replace(F.lower(c), "([-'])", "$1\u0001 ")
    return F.regexp_replace(F.initcap(marked), "\u0001 ", "")


def euclidean_distance(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """C4: the reference's one named UDF (R_groupe4.R:113,131) as a pure
    builtin expression — stays inside whole-stage codegen."""
    return F.sqrt(F.pow(x1 - x2, 2) + F.pow(y1 - y2, 2))


def bucketize(col: str | Column, thresholds: list[tuple[float, str]], default: str) -> Column:
    """P9/C5: threshold bucketing (case_when chain, R_groupe4.R:725-730).

    ``thresholds`` = [(upper_bound_exclusive, label), ...] ascending.
    """
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for bound, label in thresholds:
        cond = c < F.lit(bound)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return expr.otherwise(default) if expr is not None else F.lit(default)


def outlier_cap(col: str | Column, threshold: float, cap: float) -> Column:
    """P4: conditional outlier rewrite (R_groupe4.R:80:
    ``if_else(age_estim > 300, 200, age_estim)``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c > threshold, F.lit(cap)).otherwise(c)


def binary_label(col: str | Column, positive_values: list[str]) -> Column:
    """P8: set-membership → 0/1 label (R_groupe4.R:1000)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isin(positive_values), F.lit(1)).otherwise(F.lit(0))

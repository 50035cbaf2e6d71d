"""Distribution-free two-sample tests (Kolmogorov–Smirnov, Mann–Whitney U).

Extends the inference family (chi-square `inference.py`, ANOVA) with the
nonparametric pair every analytics engine ships — the reference's stats
section (R_groupe4.R:809-887) stays inside parametric tests, but `ks.test`
/ `wilcox.test` are the base-R siblings of what it does call, and drift
checks on 100 TB feeds want exactly these.

Exactness strategy (the repo's driver-hash convention): both statistics
reduce to integer algebra over per-value group counts —

  KS:  D·n1·n2   = max over values of |c1·n2 − c2·n1|        (integers)
  MWU: 2·R1      = Σ d1·(2·before + t + 1)                    (integers)

so the only IEEE steps are single divisions/sqrt on identical integers,
rounded to 6 dp on both engines.

Scale shape: one groupBy on the value column (distinct-value counts), then
`global_prefix_sum` — the two-phase parallel scan, never a single-reducer
window over data-sized input — then one max/sum reduction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import round_disp
from ..operators.windows import global_prefix_sum


def _group_value_counts(
    df: DataFrame, value: str, group: Column
) -> DataFrame:
    """Per-distinct-value counts for the two groups.

    ``group`` must evaluate to 1 (sample 1), 2 (sample 2), or null
    (excluded). One shuffle; output cardinality = |distinct values|.
    """
    return (
        df.select(F.col(value).alias("v"), group.alias("g"))
        .where(F.col("g").isNotNull())
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("d1"),
            F.sum(F.when(F.col("g") == 2, 1).otherwise(0)).alias("d2"),
        )
    )


def ks_two_sample(df: DataFrame, value: str, group: Column) -> DataFrame:
    """Two-sample KS test: D = sup_x |F1(x) − F2(x)|.

    Returns one row: n1, n2, d_stat (round6), d_location (the smallest
    value attaining the sup — deterministic under ties), and the
    asymptotic rejection threshold at α=0.05
    (c(α)·sqrt((n1+n2)/(n1·n2)), c(0.05)=1.358) with the reject flag, so
    the output is a decision, not just a number.
    """
    counts = _group_value_counts(df, value, group)
    cum = global_prefix_sum(counts, "v", ["d1", "d2"])
    totals = cum.agg(F.sum("d1").alias("n1"), F.sum("d2").alias("n2"))
    # widen to DECIMAL(38,0) before the cross products: at the 100 TB
    # regime this module targets, c1*n2 with per-group counts ~3e9 is
    # ~9e20 > Long.MAX — bigint math would abort (ANSI) or wrap.
    # DuckDB's SUM already yields INT128, so only the Spark side widens.
    dec = "decimal(38,0)"
    scored = cum.join(F.broadcast(totals)).select(
        "v",
        "n1",
        "n2",
        F.abs(
            F.col("d1_cum").cast(dec) * F.col("n2")
            - F.col("d2_cum").cast(dec) * F.col("n1")
        ).alias("scaled_gap"),
    )
    # argmax in ONE aggregation pass (r12): min_by over the composite
    # ordering (−gap, v-is-null, v) picks the max gap and, among gap
    # ties, the smallest v — exactly the old max → equi-join-back →
    # min(v) pipeline (which cost a second pass over `scored` plus a
    # broadcast join). −gap is DECIMAL negation (exact); the null flag
    # reproduces MIN's null-skipping (struct ordering alone would sort a
    # NULL v FIRST and steal the argmax); NaN v follows the same
    # NaN-is-largest comparison MIN used. Pinned in tests.
    loc = scored.groupBy("n1", "n2").agg(
        F.max("scaled_gap").alias("max_gap"),
        F.min_by(
            F.col("v"),
            F.struct(
                (-F.col("scaled_gap")).alias("ng"),
                F.col("v").isNull().cast("int").alias("vnull"),
                F.col("v"),
            ),
        ).alias("d_location"),
    )
    n1n2 = (F.col("n1").cast(dec) * F.col("n2")).cast("double")
    d = F.col("max_gap").cast("double") / n1n2
    thresh = F.lit(1.358) * F.sqrt((F.col("n1") + F.col("n2")) / n1n2)
    return loc.select(
        "n1",
        "n2",
        F.round(d, 6).alias("d_stat"),
        "d_location",
        F.round(thresh, 6).alias("crit_05"),
        (d > thresh).alias("reject_05"),
    )


def mannwhitney_u(df: DataFrame, value: str, group: Column) -> DataFrame:
    """Mann–Whitney U with midrank ties and tie-corrected normal approx.

    For value v with group counts (d1, d2), t = d1+d2, and ``before`` =
    pooled count of strictly-smaller values, every tied observation gets
    midrank (2·before + t + 1)/2, so

        2·R1 = Σ_v d1(v) · (2·before(v) + t(v) + 1)      — exact integers.

    U1 = R1 − n1(n1+1)/2; z uses the tie-corrected variance
    n1·n2/12 · ((n+1) − Σ(t³−t)/(n(n−1))). Output: n1, n2, u_stat,
    z_score (round6), rank_biserial (round6 effect size).
    """
    counts = _group_value_counts(df, value, group).withColumn(
        "t", F.col("d1") + F.col("d2")
    )
    cum = global_prefix_sum(counts, "v", ["t"])
    terms = cum.select(
        "d1",
        "t",
        (F.col("t_cum") - F.col("t")).alias("before"),
    )
    # DECIMAL(38,0) accumulators: d1*(2*before+t+1) has per-term magnitude
    # ~3n and total ~3*n1*n (~5e20 at the 100 TB regime) — beyond bigint.
    dec = "decimal(38,0)"
    aggd = terms.agg(
        F.sum("d1").alias("n1"),
        F.sum(F.col("t") - F.col("d1")).alias("n2"),
        F.sum(
            F.col("d1").cast(dec)
            * (F.lit(2) * F.col("before") + F.col("t") + F.lit(1))
        ).alias("two_r1"),
        F.sum(
            F.col("t").cast(dec) * F.col("t") * F.col("t") - F.col("t")
        ).alias("tie_sum"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    n = n1 + n2
    two_u1 = F.col("two_r1") - n1.cast(dec) * (n1 + 1)  # 2·U1, exact integer
    u1 = two_u1.cast("double") / 2.0
    n1n2 = (n1.cast(dec) * n2).cast("double")
    mean_u = n1n2 / 2.0
    var_u = n1n2 / 12.0 * (
        (n + 1).cast("double")
        - F.col("tie_sum").cast("double")
          / (n.cast(dec) * (n - 1)).cast("double")
    )
    z = (u1 - mean_u) / F.sqrt(var_u)
    rb = F.lit(1.0) - two_u1.cast("double") / n1n2
    return aggd.select(
        "n1",
        "n2",
        u1.alias("u_stat"),
        # round_disp: z and the effect size are signed (q43 convention)
        round_disp(z, 6).alias("z_score"),
        round_disp(rb, 6).alias("rank_biserial"),
    )

"""Closed-form regression as aggregation (SURVEY §2.11 M6; M4's SQL twin).

Reference: ``lm(age_estim ~ tronc_diam)`` + predict + RSE + R²
(R_groupe4.R:983-996). Simple OLS has an exact closed form from the same
moment sums the descriptive module computes — slope = S_xy/S_xx (centered),
intercept = ȳ − slope·x̄ — so it is oracle-checkable and runs as ONE
aggregation pass at any scale. Multiple OLS with inference lives in ``ml``
(Spark ML, normal solver); this module also provides the inferential pieces
for the simple model (std errors, t, p) from the same sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import dec, round6
from .distributions import t_sf


def _ols_moments_df(df: DataFrame, y: str, x: str, scale: int = 4) -> DataFrame:
    """One-pass exact moment sums (n, Σx, Σy, Σx², Σy², Σxy) — the shared
    input of both the display fit and the inferential summary."""
    clean = df.dropna(subset=[x, y])
    return clean.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(x, 38, scale)).cast("double").alias("sx"),
        F.sum(dec(y, 38, scale)).cast("double").alias("sy"),
        F.sum(dec(x, 18, scale // 2) * dec(x, 18, scale // 2)).cast("double").alias("sxx"),
        F.sum(dec(y, 18, scale // 2) * dec(y, 18, scale // 2)).cast("double").alias("syy"),
        F.sum(dec(x, 18, scale // 2) * dec(y, 18, scale // 2)).cast("double").alias("sxy"),
    )


def simple_ols_df(df: DataFrame, y: str, x: str, scale: int = 4) -> DataFrame:
    """M6 as a DataFrame: slope, intercept, r2, rse, n — exact sums,
    deterministic double math, round6."""
    agg = _ols_moments_df(df, y, x, scale)
    n = F.col("n").cast("double")
    ssxx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    ssyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    ssxy = F.col("sxy") - F.col("sx") * F.col("sy") / n
    slope = ssxy / ssxx
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    r2 = (ssxy * ssxy) / (ssxx * ssyy)
    sse = ssyy - slope * ssxy
    rse = F.sqrt(sse / (n - 2))
    return agg.select(
        round6(slope).alias("slope"),
        round6(intercept).alias("intercept"),
        round6(r2).alias("r2"),
        round6(rse).alias("rse"),
        F.col("n").cast("long").alias("n"),
    )


def simple_ols_oracle_sql(table: str, y: str, x: str, scale: int = 4, where: str = "") -> str:
    w = f"AND {where}" if where else ""
    return f"""
    WITH m AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST({x} AS DECIMAL(38,{scale}))) AS DOUBLE) AS sx,
             CAST(SUM(CAST({y} AS DECIMAL(38,{scale}))) AS DOUBLE) AS sy,
             CAST(SUM(CAST({x} AS DECIMAL(18,{scale//2})) * CAST({x} AS DECIMAL(18,{scale//2}))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST({y} AS DECIMAL(18,{scale//2})) * CAST({y} AS DECIMAL(18,{scale//2}))) AS DOUBLE) AS syy,
             CAST(SUM(CAST({x} AS DECIMAL(18,{scale//2})) * CAST({y} AS DECIMAL(18,{scale//2}))) AS DOUBLE) AS sxy
      FROM {table} WHERE {x} IS NOT NULL AND {y} IS NOT NULL {w}),
    d AS (
      SELECT n, sxx - sx * sx / CAST(n AS DOUBLE) AS ssxx,
             syy - sy * sy / CAST(n AS DOUBLE) AS ssyy,
             sxy - sx * sy / CAST(n AS DOUBLE) AS ssxy,
             sx, sy
      FROM m)
    SELECT ROUND(ssxy / ssxx, 6) AS slope,
           ROUND((sy - (ssxy / ssxx) * sx) / CAST(n AS DOUBLE), 6) AS intercept,
           ROUND(ssxy * ssxy / (ssxx * ssyy), 6) AS r2,
           ROUND(SQRT((ssyy - (ssxy / ssxx) * ssxy) / (CAST(n AS DOUBLE) - 2)), 6) AS rse,
           CAST(n AS BIGINT) AS n
    FROM d
    """


def simple_ols_inference(df: DataFrame, y: str, x: str, scale: int = 4) -> dict[str, float]:
    """M6 inferential summary (slope std-error, t, p — R ``summary.lm``
    analog). ONE aggregation pass: every statistic derives from the same
    unrounded moment sums (no second scan, no rounding error feeding into
    t/p); display keys are rounded only at output, matching
    :func:`simple_ols_df`."""
    m = _ols_moments_df(df, y, x, scale).collect()[0]
    n = m["n"]
    nf = float(n)
    ssxx = m["sxx"] - m["sx"] * m["sx"] / nf
    ssyy = m["syy"] - m["sy"] * m["sy"] / nf
    ssxy = m["sxy"] - m["sx"] * m["sy"] / nf
    slope = ssxy / ssxx
    intercept = (m["sy"] - slope * m["sx"]) / nf
    r2 = (ssxy * ssxy) / (ssxx * ssyy)
    sse = ssyy - slope * ssxy
    rse = (sse / (nf - 2)) ** 0.5
    se_slope = rse / ssxx**0.5
    t = slope / se_slope
    return {
        "slope": round(slope, 6),
        "intercept": round(intercept, 6),
        "r2": round(r2, 6),
        "rse": round(rse, 6),
        "n": n,
        "se_slope": se_slope,
        "t_slope": t,
        "p_slope": 2.0 * t_sf(abs(t), n - 2),
    }


def predict_simple(df: DataFrame, slope: float, intercept: float, x: str, out: str = "pred") -> DataFrame:
    """M6 point prediction (reference ``predict(modele, newdata)``)."""
    return df.withColumn(out, F.lit(slope) * F.col(x) + F.lit(intercept))

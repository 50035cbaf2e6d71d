"""Driver-contract query registry.

Each entry pairs a PySpark query (built from the engine's operator library)
with an ANSI-SQL twin the DuckDB oracle runs on the same parquet tables.
Column names and float paths follow the exactness conventions in
``functions.scalar`` (decimal sums, round6 on float-path aggregates) so the
driver's order-insensitive value hash matches bit-for-bit.

Registry grows operator-by-operator with SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import aggregations as agg
from .sources.readers import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLE)


# ---------------------------------------------------------------------------
# A3/A4/A11 + S1: the flagship grouped aggregation (TPC-H Q1 shape —
# SURVEY §2.5; reference analog: grouped means R_groupe4.R:231-246)
# ---------------------------------------------------------------------------
@register(
    "q01_grouped_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_discount AS DECIMAL(28,4))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.scalar import dec, dec_avg, dec_sum

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            F.sum(dec("l_extendedprice", 18, 4) * dec(F.lit(1) - F.col("l_discount"), 18, 4))
            .cast("double")
            .alias("sum_disc_price"),
            dec_avg("l_quantity").alias("avg_qty"),
            dec_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# A1/A2: ungrouped stats bundle (reference R_groupe4.R:213-228)
# ---------------------------------------------------------------------------
@register(
    "q02_summary_stats_global",
    oracle="""
    SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) / COUNT(o_totalprice) AS mean_val,
           ROUND(quantile_cont(o_totalprice, 0.5), 6) AS median_val,
           ROUND(quantile_cont(o_totalprice, 0.25), 6) AS p25,
           ROUND(quantile_cont(o_totalprice, 0.75), 6) AS p75,
           ROUND(quantile_cont(o_totalprice, 0.75) - quantile_cont(o_totalprice, 0.25), 6) AS iqr,
           MIN(o_totalprice) AS min_val,
           MAX(o_totalprice) AS max_val,
           COUNT(o_totalprice) AS n
    FROM orders
    """,
)
def q02_summary_stats_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return agg.summary_stats(orders, "o_totalprice")


# ---------------------------------------------------------------------------
# A5: grouped stats bundle with quartiles/IQR (reference R_groupe4.R:249-272)
# ---------------------------------------------------------------------------
@register(
    "q03_summary_stats_grouped",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) / COUNT(l_quantity) AS mean_val,
           ROUND(quantile_cont(l_quantity, 0.5), 6) AS median_val,
           ROUND(quantile_cont(l_quantity, 0.25), 6) AS p25,
           ROUND(quantile_cont(l_quantity, 0.75), 6) AS p75,
           ROUND(quantile_cont(l_quantity, 0.75) - quantile_cont(l_quantity, 0.25), 6) AS iqr,
           MIN(l_quantity) AS min_val,
           MAX(l_quantity) AS max_val,
           COUNT(l_quantity) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q03_summary_stats_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return agg.summary_stats(li, "l_quantity", group_by=["l_returnflag"])

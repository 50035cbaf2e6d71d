"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``isen_projet_bigdata_a3s6_spark`` — this module is
the thin contract surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)

from isen_projet_bigdata_a3s6_spark import queries as _registry  # noqa: E402

_PKG_SHIPPED: set[str] = set()


def _ensure_pkg_on_workers(spark: SparkSession) -> None:
    """Python workers spawn with the driver JVM's original sys.path — when
    the driver runs outside the repo dir, pandas-UDF closures referencing
    this package fail to unpickle. Shipping the package as a zip via
    addPyFile fixes every UDF path (geo, multimodal) in any session."""
    # timestamps from the nanos-parquet reader are session-tz LTZ; DuckDB's
    # are UTC-naive — a non-UTC driver session would shift event-time
    # windows. Pin UTC for every contract query.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # testdata timestamps are TIMESTAMP(MICROS, isAdjustedToUTC=false);
    # read as UTC instants (not TIMESTAMP_NTZ) so watermarks/windows work
    # and calendar fields match DuckDB's naive reading.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    key = spark.sparkContext.applicationId
    if key in _PKG_SHIPPED:
        return
    import tempfile
    import zipfile

    zpath = os.path.join(tempfile.gettempdir(), "isen_a3s6_pkg.zip")
    pkg_dir = os.path.join(_REPO_DIR, "isen_projet_bigdata_a3s6_spark")
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, _REPO_DIR))
    spark.sparkContext.addPyFile(zpath)
    _PKG_SHIPPED.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H-Q1-shaped grouped
    aggregation (SURVEY §2.5 A3/A4/A11 — the reference's most representative
    query shape, R_groupe4.R:231-272)."""
    _ensure_pkg_on_workers(spark)
    return _registry.q01_grouped_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_pkg_on_workers(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in _registry.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin per query (same column names)."""
    return _registry.oracle_sql()

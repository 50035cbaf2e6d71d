"""Scans (SURVEY §2.1 S1/S3).

Reference behavior: one CSV read (``R_groupe4.R:41-42``) producing an untyped
all-string frame with types recovered by cast-at-use. We instead declare
schemas and cast once at ingest — same observable semantics, sane types, and
it lets the parquet reader prune columns / push filters (free via Catalyst).

At 100 TB: parquet scans here inherit predicate pushdown, column pruning and
partition pruning; keep filters/selects on the raw reader output so they
reach the scan (verify with ``df.explain`` → ``PushedFilters`` /
``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: driver-generated test tables (TESTDATA.md); one parquet file per table
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S1: columnar scan — pushdown + pruning come free."""
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    all_string: bool = False,
) -> DataFrame:
    """S1: CSV scan (reference ``read.csv`` at R_groupe4.R:41-42).

    ``all_string=True`` reproduces the reference's untyped read exactly
    (every column StringType, cast later); otherwise pass an explicit
    ``schema`` — never infer in production (two passes over the data).
    """
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    elif not all_string:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_binary_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """S3: binary scan (reference ``readPNG`` at R_groupe4.R:653) →
    columns (path, modificationTime, length, content:binary)."""
    return spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_ns_safe(spark, os.path.join(sf_dir, f"{name}.parquet"))


# Footer-probe cache for read_parquet_ns_safe: path -> (mtime, ns_cols).
# A bench session calls load_table hundreds of times on the same handful of
# parquet files; the nanos-column answer only changes if the file does, so
# key on mtime and skip the pyarrow footer read on repeat loads.
_NS_COLS_CACHE: dict[str, tuple[float, list[str]]] = {}


def _probe_ns_cols(path: str) -> list[str]:
    import pyarrow.parquet as pq

    try:
        mtime = os.path.getmtime(path)
    except OSError:
        mtime = -1.0
    hit = _NS_COLS_CACHE.get(path)
    if hit is not None and hit[0] == mtime:
        return hit[1]
    try:
        footer = pq.read_schema(path)
        ns_cols = [f.name for f in footer if str(f.type).startswith("timestamp[ns")]
    except Exception:
        # do NOT cache the failure fallback: a transient probe error (file
        # mid-regeneration, momentary IO blip) would otherwise pin [] for
        # the whole session and break every later nanos-parquet read
        return []
    _NS_COLS_CACHE[path] = (mtime, ns_cols)
    return ns_cols


def read_parquet_ns_safe(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan tolerant of TIMESTAMP(NANOS) columns (e.g. the driver's
    ``events.ts``), which Spark rejects by default. Nanos columns are read
    as long via the legacy conf and converted back to timestamps with exact
    integer division (a double round-trip would lose precision past 2^53 ns).
    Same truncation DuckDB applies reading ns parquet, so oracle parity holds.

    SESSION-GLOBAL SIDE EFFECT (deliberate, documented): this function sets
    ``spark.sql.parquet.inferTimestampNTZ.enabled=false`` — and, for files
    that contain nanos columns, ``spark.sql.session.timeZone=UTC`` and
    ``spark.sql.legacy.parquet.nanosAsLong=true`` — on the LIVE session, and
    does NOT restore prior values. Restoring after ``spark.read`` would be
    wrong: the returned DataFrame is lazy and parquet reader confs are
    consulted again at execution time, so a restore would silently flip
    semantics under the un-executed plan. These are the engine's session
    contract (``session.py`` sets the same values at construction; this is
    the defensive re-assert for host-provided sessions, e.g. the driver's).
    A caller that needs TIMESTAMP_NTZ reads elsewhere must use a separate
    session.
    """
    from pyspark.sql import functions as F

    ns_cols = _probe_ns_cols(path)
    # micros/millis timestamps with isAdjustedToUTC=false must read as UTC
    # instants, not TIMESTAMP_NTZ (watermarks and window() reject NTZ);
    # with the UTC session tz the calendar fields match DuckDB's naive read.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if not ns_cols:
        return spark.read.parquet(path)
    # the converted column is session-tz TIMESTAMP — pin UTC so its calendar
    # fields match DuckDB's UTC-naive reading in any host session
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}

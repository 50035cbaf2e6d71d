"""SparkSession factory.

The reference (R_groupe4.R:41) runs one eager single-threaded R process; our
engine runs the same logical workload on Spark. Defaults are tuned for the
local[32] test harness but every knob is the one you'd also set on a real
cluster: AQE on (runtime re-planning, skew-join splitting, partition
coalescing), shuffle partitions sized to cores, Arrow enabled for the few
pandas-UDF paths, and UTC session time so results compare bit-for-bit against
the DuckDB oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "isen_a3s6_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    At 100 TB the same config holds except ``master``/memory come from the
    cluster manager and ``spark.sql.shuffle.partitions`` should be sized to
    ~2-3x total cores (or left to AQE's coalescing with a high initial value).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    nparts = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(nparts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata timestamps are parquet TIMESTAMP(MICROS, isAdjustedToUTC
        # = false); Spark 4 would infer TIMESTAMP_NTZ, which watermarks and
        # time-window functions reject. Reading them as UTC instants (with
        # the UTC session tz above) keeps calendar fields identical to
        # DuckDB's naive reading AND keeps filter pushdown on the scan.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # exact percentiles are the default for oracle parity; flip to
        # approx at scale via functions.scalar.percentile(exact=False)
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

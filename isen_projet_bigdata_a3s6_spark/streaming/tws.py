"""transformWithState — Spark 4's arbitrary-stateful-processing API — and
checkpoint-restart recovery, the two Structured Streaming capabilities the
registry didn't yet demonstrate.

``transformWithStateInPandas`` (SPARK-49564) supersedes
``applyInPandasWithState`` (streaming/stateful.py keeps that older operator
for comparison): instead of one opaque state tuple, the processor declares
NAMED, individually-evolvable state variables (ValueState / ListState /
MapState) against a handle, gets timers in the same interface, and runs on
the RocksDB state store, which is what makes per-key state spill-free at
100 TB/day. The demo processor maintains a per-user profile across
micro-batches: a ValueState with running (event count, value-micros sum)
and a MapState of per-event-type counts.

``restart_recovery_counts`` drives the exactly-once contract end-to-end:
a file-sink query consumes half the input, is STOPPED, more input arrives,
and a NEW query object with the same checkpoint resumes — the sink must
hold every input row exactly once across the restart (the checkpoint ties
source offsets to sink commits; re-delivered batches are idempotently
skipped via the sink's transaction log).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..scratch import scratch_dir
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle


class _UserProfileProcessor(StatefulProcessor):
    """Per-user running profile with two named state variables."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "n BIGINT, sv BIGINT")
        self._by_type = handle.getMapState(
            "by_type", "t STRING", "c BIGINT"
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n = sv = 0
        if self._totals.exists():
            prev = self._totals.get()
            n, sv = prev[0], prev[1]
        for pdf in rows:
            n += len(pdf)
            # value has ≤4 dp (the q71 decimal convention): micros-exact
            sv += int(round(float(pdf["value"].sum()) * 10000))
            for t, c in pdf.groupby("event_type").size().items():
                old = (
                    self._by_type.getValue((t,))[0]
                    if self._by_type.containsKey((t,))
                    else 0
                )
                self._by_type.updateValue((t,), (old + int(c),))
        self._totals.update((n, sv))
        n_types = sum(1 for _ in self._by_type.keys())
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_micros": [sv],
                "n_types": [n_types],
            }
        )

    def close(self) -> None:
        pass


def _tws_available() -> bool:
    """transformWithState's Python state server speaks protobuf to the JVM;
    without the google.protobuf package the runner crashes at init. This
    container ships no protobuf (and installs are out of scope), so the
    operator gates on the import and falls back to the older
    applyInPandasWithState API with identical semantics — the same
    sanctioned environment-block handling as the multimodal codecs. On a
    real cluster (protobuf present) the TWS path runs as written."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def _profile_fallback(
    spark: SparkSession, stream, query_name: str
) -> DataFrame:
    """Same per-user profile via applyInPandasWithState: one state tuple
    (n, sum_micros, seen types array) instead of named state variables."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n, sv, types = (state.get if state.exists else (0, 0, []))
        types = list(types)
        for pdf in pdfs:
            n += len(pdf)
            sv += int(round(float(pdf["value"].sum()) * 10000))
            for t in pdf["event_type"].unique():
                if t not in types:
                    types.append(t)
        state.update((n, sv, types))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_micros": [sv],
                "n_types": [len(types)],
            }
        )

    out = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id BIGINT, n_events BIGINT, sum_micros BIGINT, n_types BIGINT",
        stateStructType="n BIGINT, sv BIGINT, types ARRAY<STRING>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    sq = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        sq.processAllAvailable()
    finally:
        sq.stop()
    return spark.table(query_name)


def tws_user_profile(
    spark: SparkSession,
    parquet_path: str,
    n_batches: int = 4,
    query_name: str = "tws_profile_out",
) -> DataFrame:
    """Run the profile processor over the events feed split into
    ``n_batches`` micro-batches (maxFilesPerTrigger=1), proving state
    survives across batches. Emissions are per-batch running totals in
    Update mode; the returned frame is the FINAL profile per user (the
    emission with the max event count — counts are monotone).

    transformWithState requires the RocksDB state store; the conf is set
    for the duration of the query and restored after. When protobuf is
    absent (this container) the applyInPandasWithState fallback runs —
    see ``_tws_available``."""
    from ..sources.readers import read_parquet_ns_safe

    batch = read_parquet_ns_safe(spark, parquet_path).select(
        "event_id", "user_id", "event_type", "value"
    )
    stage = scratch_dir(spark, "tws_src")
    batch.repartition(n_batches).write.mode("overwrite").parquet(stage)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    if not _tws_available():
        emissions = _profile_fallback(spark, stream, query_name)
        return (
            emissions.groupBy("user_id")
            .agg(
                F.max_by(
                    F.struct("n_events", "sum_micros", "n_types"), "n_events"
                ).alias("s")
            )
            .select("user_id", "s.n_events", "s.sum_micros", "s.n_types")
        )
    out = stream.groupBy("user_id").transformWithStateInPandas(
        _UserProfileProcessor(),
        outputStructType="user_id BIGINT, n_events BIGINT, sum_micros BIGINT, n_types BIGINT",
        outputMode="Update",
        timeMode="None",
    )
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(
        conf_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        sq = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        try:
            sq.processAllAvailable()
        finally:
            sq.stop()
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
    emissions = spark.table(query_name)
    # final state per user = the largest running count emitted
    return (
        emissions.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("n_events", "sum_micros", "n_types"), "n_events"
            ).alias("s")
        )
        .select("user_id", "s.n_events", "s.sum_micros", "s.n_types")
    )


def restart_recovery_counts(
    spark: SparkSession,
    parquet_path: str,
) -> DataFrame:
    """Exactly-once across a query RESTART: phase 1 consumes the even-id
    half of the feed into a checkpointed parquet sink and stops; phase 2
    drops the odd-id half into the source directory and starts a NEW query
    with the SAME checkpoint and sink. The checkpoint replays nothing and
    loses nothing, so the sink read back equals the batch twin exactly.
    Returns per-type counts + micros sums over the recovered sink."""
    from ..sources.readers import read_parquet_ns_safe

    batch = read_parquet_ns_safe(spark, parquet_path).select(
        "event_id", "user_id", "event_type", "value"
    )
    src = scratch_dir(spark, "restart_src")
    ckpt = scratch_dir(spark, "restart_ckpt")
    sink = scratch_dir(spark, "restart_sink") + "/out"

    def run_phase() -> None:
        stream = spark.readStream.schema(batch.schema).parquet(src)
        proj = stream.withColumn(
            "micros", F.round(F.col("value") * 10000).cast("long")
        )
        sq = (
            proj.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            sq.processAllAvailable()
        finally:
            sq.stop()

    # the file source does not recurse: land each half as flat files in
    # the source dir (write to a scratch dir, move the parts in)
    import glob
    import shutil

    def land(df, tag: str) -> None:
        scratch = scratch_dir(spark, f"restart_{tag}")
        df.coalesce(1).write.mode("overwrite").parquet(scratch)
        for i, f in enumerate(sorted(glob.glob(os.path.join(scratch, "*.parquet")))):
            shutil.move(f, os.path.join(src, f"{tag}_{i}.parquet"))

    land(batch.filter(F.col("event_id") % 2 == 0), "even")
    run_phase()
    land(batch.filter(F.col("event_id") % 2 == 1), "odd")
    run_phase()  # new query object, same checkpoint: resumes, no replay

    recovered = spark.read.parquet(sink)
    return recovered.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("micros").alias("sum_micros"),
        F.count_distinct("user_id").alias("n_users"),
    )

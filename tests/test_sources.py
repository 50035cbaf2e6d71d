"""Source operators: binary scan (S3), CSV round-trip (S1/S2), ns-parquet."""

import os

from isen_projet_bigdata_a3s6_spark.sources.readers import (
    load_table,
    read_binary_files,
    read_csv,
    read_parquet_ns_safe,
)
from isen_projet_bigdata_a3s6_spark.sources.writers import write_csv


def test_binary_file_scan(spark, tmp_path):
    (tmp_path / "a.bin").write_bytes(b"\x89PNG-fake")
    (tmp_path / "b.bin").write_bytes(b"RIFF-fake")
    df = read_binary_files(spark, str(tmp_path), "*.bin")
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 2
    assert {os.path.basename(r["path"]) for r in rows} == {"a.bin", "b.bin"}
    assert all(r["length"] > 0 and bytes(r["content"]) for r in rows)


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id int, s string")
    out = str(tmp_path / "csv_out")
    write_csv(df, out, single_file=True)
    back = read_csv(spark, out, schema=None, header=True)
    assert sorted(map(tuple, back.collect())) == [(1, "x"), (2, "y")]


def test_ns_parquet_reader(spark, sf_dir):
    # events.ts is TIMESTAMP(NANOS) parquet — reader must produce timestamps
    e = load_table(spark, sf_dir, "events")
    assert dict(e.dtypes)["ts"] == "timestamp"
    assert e.filter(e.ts.isNotNull()).count() == e.count()
    # non-ns tables untouched
    o = read_parquet_ns_safe(spark, os.path.join(sf_dir, "orders.parquet"))
    assert dict(o.dtypes)["o_orderdate"].startswith("timestamp")


def test_json_orc_roundtrip_type_exact(spark, tmp_path):
    from isen_projet_bigdata_a3s6_spark.sources.writers import write_json, write_orc

    df = spark.createDataFrame(
        [(1, "x", 1.5), (2, "y", -2.25)], "id long, s string, v double"
    )
    jdir, odir = str(tmp_path / "j"), str(tmp_path / "o")
    write_json(df, jdir)
    back_j = spark.read.schema("id long, s string, v double").json(jdir)
    assert sorted(map(tuple, back_j.collect())) == [(1, "x", 1.5), (2, "y", -2.25)]
    write_orc(df, odir)
    back_o = spark.read.orc(odir)
    assert back_o.schema == df.schema  # ORC: type-exact round trip
    assert sorted(map(tuple, back_o.collect())) == [(1, "x", 1.5), (2, "y", -2.25)]


def test_clustered_layout_prunes_and_sorts(spark, sf_dir, tmp_path):
    """write_clustered: hive dirs on the partition column, range-clustered
    files, rows sorted within files — and a reader filter on the partition
    column prunes before any file I/O."""
    import os as _os

    from pyspark.sql import functions as F

    from isen_projet_bigdata_a3s6_spark.sources.writers import write_clustered

    e = load_table(spark, sf_dir, "events").withColumn("dt", F.to_date("ts"))
    out = str(tmp_path / "events_clustered")
    write_clustered(
        e.select("event_id", "ts", "value", "dt"), out,
        partition_by=["dt"], range_cols=["ts"],
    )
    assert any(d.startswith("dt=") for d in _os.listdir(out))
    back = spark.read.parquet(out)
    week = back.filter(F.col("dt") == "2024-01-05")
    plan = week._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "dt" in plan.split("PartitionFilters")[1][:200]
    # within every physical file, rows are ts-sorted (footer min/max stats
    # effective for row-group skipping)
    per_file: dict[str, list] = {}
    for r in (
        spark.read.parquet(out + "/dt=2024-01-05")
        .select("ts", F.input_file_name().alias("f"))
        .collect()
    ):
        per_file.setdefault(r["f"], []).append(r["ts"])
    assert per_file and all(v == sorted(v) for v in per_file.values())
    assert week.count() == e.filter(F.col("dt") == "2024-01-05").count()


def test_partitioned_write_and_pruning(spark, sf_dir, tmp_path):
    """Partitioned parquet + partition pruning: the scan of a filtered read
    must only touch the matching partition directories."""
    from pyspark.sql import functions as F

    from isen_projet_bigdata_a3s6_spark.sources.writers import write_parquet

    e = load_table(spark, sf_dir, "events").withColumn(
        "dt", F.to_date("ts")
    )
    out = str(tmp_path / "events_part")
    write_parquet(e, out, partition_by=["dt"])
    back = spark.read.parquet(out)
    one_day = back.filter(F.col("dt") == "2024-01-05")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # partition filter must appear as a partition filter, not a data filter
    assert "PartitionFilters" in plan
    assert one_day.count() == e.filter(F.col("dt") == "2024-01-05").count()


def test_zorder_key_interleave(spark):
    from pyspark.sql import functions as F

    from isen_projet_bigdata_a3s6_spark.sources.writers import zorder_key2

    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5), (7, 7)], "a int, b int")
    got = [r["z"] for r in df.select(zorder_key2("a", "b", bits=4).alias("z")).collect()]
    def morton(a, b):
        z = 0
        for i in range(4):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z
    assert got == [morton(a, b) for a, b in [(0, 0), (1, 0), (0, 1), (3, 5), (7, 7)]]


def test_write_zordered_range_guard(spark, tmp_path):
    import pytest

    from isen_projet_bigdata_a3s6_spark.sources.writers import write_zordered

    df = spark.createDataFrame([(1, 1 << 10)], "a int, b int")
    with pytest.raises(ValueError):
        write_zordered(df, str(tmp_path / "z"), "a", "b", bits=8)

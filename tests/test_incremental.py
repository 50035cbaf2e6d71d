"""Dynamic partition-overwrite MERGE and exact-k stratified sampling."""

import glob
import os
import tempfile

from pyspark.sql import functions as F

from isen_projet_bigdata_a3s6_spark.operators.merge import merge_partition_overwrite
from isen_projet_bigdata_a3s6_spark.operators.sampling import stratified_exact_k


def test_partition_overwrite_touches_only_changed_partitions(spark):
    base = tempfile.mkdtemp(prefix="po_test_") + "/t"
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)], "id long, p int, v double"
    )
    df.write.partitionBy("p").parquet(base)

    def snapshot(part):
        return {
            f: (os.path.getsize(f), os.path.getmtime(f))
            for f in glob.glob(f"{base}/p={part}/*.parquet")
        }

    before_p0, before_p2 = snapshot(0), snapshot(2)
    fix = df.filter(F.col("p") == 1).withColumn("v", F.col("v") * 10)
    merge_partition_overwrite(fix, base, ["p"])

    # untouched partitions: identical file sets, sizes, and mtimes
    assert snapshot(0) == before_p0 and snapshot(2) == before_p2
    back = spark.read.parquet(base)
    assert back.count() == 30
    got = {r["id"]: r["v"] for r in back.filter("p = 1").collect()}
    assert got == {i: i * 10.0 for i in range(30) if i % 3 == 1}
    # config restored after the merge
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        != "dynamic"
    )


def test_stratified_exact_k(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(1, 201)], "id long, s string"
    )
    out = stratified_exact_k(df, key_col="id", stratum_col="s", k=10)
    rows = out.collect()
    by_s = {}
    for r in rows:
        by_s.setdefault(r["s"], set()).add(r["id"])
    assert {k: len(v) for k, v in by_s.items()} == {"a": 10, "b": 10}
    # deterministic: re-running and repartitioning yields the same membership
    again = stratified_exact_k(df.repartition(7), "id", "s", k=10).collect()
    assert {(r["s"], r["id"]) for r in again} == {(r["s"], r["id"]) for r in rows}
    # small stratum: returns all of it
    tiny = spark.createDataFrame([(1, "x"), (2, "x")], "id long, s string")
    assert stratified_exact_k(tiny, "id", "s", k=10).count() == 2

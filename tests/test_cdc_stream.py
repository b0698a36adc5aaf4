"""Streaming SCD2 maintenance must equal the sequential batch
application of the same update batches."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from datasette_upload_csvs_spark.operators.merge import scd2_apply
from datasette_upload_csvs_spark.streaming.cdc import maintain_scd2_stream


def _rows(batch):
    return {
        (r["k"], r["v"], str(r["valid_from"]), str(r["valid_to"]))
        for r in batch
    }


def test_scd2_stream_equals_sequential_batches(spark, tmp_path):
    src = str(tmp_path / "cdc_src")
    os.makedirs(src)
    batches = [
        [(1, "a0", "2021-01-01 00:00:00"), (2, "b0", "2021-01-01 00:00:00")],
        # batch with an intra-batch duplicate for key 1: latest wins
        [(1, "a1-old", "2021-06-01 00:00:00"), (1, "a1", "2021-06-02 00:00:00"),
         (3, "c0", "2021-06-02 00:00:00")],
        [(2, "b1", "2022-01-01 00:00:00")],
    ]
    for i, b in enumerate(batches):
        df = spark.createDataFrame(b, "k int, v string, ts string").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        d = str(tmp_path / f"b{i}")
        df.coalesce(1).write.mode("overwrite").parquet(d)
        name = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(d, name), os.path.join(src, f"arrival_{i}.parquet"))

    table = "scd2_stream_dim"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    n = maintain_scd2_stream(
        spark, src, "k int, v string, ts timestamp", table,
        keys=["k"], ts_col="ts",
    )
    assert n == 3
    got = _rows(spark.table(table).collect())

    # sequential reference: same compaction rule applied by hand
    cur = None
    for b in batches:
        df = spark.createDataFrame(b, "k int, v string, ts string").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        latest = df.groupBy("k").agg(F.max(F.struct("ts", "v")).alias("l")).select(
            "k", F.col("l.v").alias("v"), F.col("l.ts").alias("ts")
        )
        ts = latest.agg(F.max("ts")).collect()[0][0]
        upd = latest.drop("ts")
        if cur is None:
            cur = upd.select(
                "*",
                F.lit(ts).alias("valid_from"),
                F.lit(None).cast("timestamp").alias("valid_to"),
            )
        else:
            cur = scd2_apply(cur, upd, ["k"], F.lit(ts))
    want = _rows(cur.collect())
    assert got == want
    live = [r for r in spark.table(table).collect() if r["valid_to"] is None]
    assert {(r["k"], r["v"]) for r in live} == {(1, "a1"), (2, "b1"), (3, "c0")}
    spark.sql(f"DROP TABLE IF EXISTS {table}")

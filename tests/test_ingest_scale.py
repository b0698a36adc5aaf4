"""Scale-shape validation of the ingest path: a ~600k-row CSV runs
through the full pipeline (sniff → all-string scan → exact type probe
→ cast → managed table) with correct types and a sane wall time.

This is the 100× version of the reference's 1049-row fixture: the
CSV is splittable, both scans parallelize across the 8 test cores,
and the probe's shuffle is O(columns)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from datasette_upload_csvs_spark import ingest
from datasette_upload_csvs_spark import queries as Q


def test_ingest_600k_rows(spark, tmp_path):
    src = Q.load(spark, "/root/testdata/sf0.1", "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
        F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss").alias("l_shipdate"),
    )
    csv_dir = os.path.join(str(tmp_path), "big_csv")
    src.coalesce(4).write.option("header", True).mode("overwrite").csv(csv_dir)
    files = [f for f in os.listdir(csv_dir) if f.endswith(".csv")]
    assert len(files) >= 2  # splittable, multi-file input

    t0 = time.perf_counter()
    res = ingest.upload_csv(spark, csv_dir, table="lineitem_csv_600k")
    elapsed = time.perf_counter() - t0
    assert res.error is None
    assert res.rows == 600_000
    assert res.types == {
        "l_orderkey": "integer",
        "l_partkey": "integer",
        "l_quantity": "float",
        "l_extendedprice": "float",
        "l_returnflag": "text",
        "l_shipdate": "text",  # timestamps stay text — no date inference
    }
    # generous budget: 2 scans + write of 600k rows on local[8]
    assert elapsed < 60, f"ingest took {elapsed:.1f}s"
    # round-trip: aggregates over the ingested table match the source
    got = spark.table("lineitem_csv_600k").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(28,4)")).cast("double").alias("s"),
    ).collect()[0]
    want = src.agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(28,4)")).cast("double").alias("s"),
    ).collect()[0]
    assert (got["n"], got["s"]) == (want["n"], want["s"])


def test_single_256mb_csv_splits_and_ticks(spark, tmp_path):
    """The 100 TB ingest claim in one test: ONE ≥256 MB CSV file must
    (a) scan as a SPLITTABLE multi-partition input (multiLine stays
    off — this is why a single huge upload parallelizes), (b) emit
    mid-flight progress ticks from the statusTracker poller, and
    (c) infer types correctly end to end."""
    # build the file with Spark itself (driver-side generation of
    # 256MB would dominate the test): ~6.6M rows ≈ 260 MB
    n = 8_200_000
    gen = spark.range(n).selectExpr(
        "id AS k",
        "concat('name_', id % 1000) AS name",
        "CAST(id % 97 AS DOUBLE) / 7 AS score",
    )
    out_dir = os.path.join(str(tmp_path), "big_single")
    gen.coalesce(1).write.option("header", True).mode("overwrite").csv(out_dir)
    part = [f for f in os.listdir(out_dir) if f.endswith(".csv")][0]
    path = os.path.join(out_dir, part)
    size = os.path.getsize(path)
    assert size >= 256 * 1024 * 1024, f"generated only {size} bytes"

    raw = ingest.read_csv_all_strings(spark, path, "utf-8")
    nparts = raw.rdd.getNumPartitions()
    assert nparts > 1, f"single-file scan not split (got {nparts} partition)"

    t0 = time.perf_counter()
    res = ingest.upload_csv(spark, path, table="big_single_tbl",
                            progress_interval=0.2)
    elapsed = time.perf_counter() - t0
    assert res.error is None
    assert res.rows == n
    assert res.types == {"k": "integer", "name": "text", "score": "float"}

    hist = (
        spark.table(ingest.PROGRESS_TABLE)
        .filter(F.col("id") == res.task_id)
        .orderBy("seq")
        .collect()
    )
    mids = [r for r in hist if 0 < r["bytes_done"] < r["bytes_todo"]]
    assert mids, "no mid-flight progress tick on a 256MB ingest"
    bd = [r["bytes_done"] for r in hist]
    assert bd == sorted(bd)
    assert hist[-1]["bytes_done"] == hist[-1]["bytes_todo"] == size
    assert elapsed < 180, f"256MB ingest took {elapsed:.1f}s"

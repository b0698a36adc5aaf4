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

"""Partitioned-layout contract: directory pruning is physical (file
index, not post-scan filter) and dynamic overwrite touches only the
incoming partitions."""

import os

from pyspark.sql import functions as F

from datasette_upload_csvs_spark.plans import formatted_plan
from datasette_upload_csvs_spark.sources.parquet import read_table
from datasette_upload_csvs_spark.sources.partitioned import (
    overwrite_partitions,
    read_partitioned,
    scanned_files,
    write_partitioned,
)


def test_partition_pruning_is_physical(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_by_status")
    orders = read_table(spark, sf_dir, "orders")
    write_partitioned(orders, path, ["o_orderstatus"], sort_cols=["o_orderdate"])

    back = read_partitioned(spark, path)
    filtered = back.filter(F.col("o_orderstatus") == "F")

    # semantic parity with the unpartitioned source
    assert filtered.count() == orders.filter(F.col("o_orderstatus") == "F").count()

    # the file index pruned: every scanned file lives in the F directory
    files = scanned_files(filtered)
    assert files and all("o_orderstatus=F" in f for f in files)

    # and the plan says so (PartitionFilters, not a post-scan Filter)
    plan = formatted_plan(filtered)
    assert "PartitionFilters" in plan
    line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "o_orderstatus" in line


def test_one_file_per_partition(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_one_file")
    orders = read_table(spark, sf_dir, "orders")
    write_partitioned(orders, path, ["o_orderstatus"])
    for d in os.listdir(path):
        if not d.startswith("o_orderstatus="):
            continue
        parts = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
        assert len(parts) == 1, f"{d}: repartition-before-write must yield one file"


def test_dynamic_overwrite_leaves_other_partitions(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_dyn")
    orders = read_table(spark, sf_dir, "orders")
    write_partitioned(orders, path, ["o_orderstatus"])
    before = {
        r[0]: r[1]
        for r in read_partitioned(spark, path)
        .groupBy("o_orderstatus")
        .count()
        .collect()
    }

    # rewrite ONLY the F partition, halved deterministically
    f_half = (
        read_partitioned(spark, path)
        .filter((F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 2 == 0))
    )
    expected_f = f_half.count()
    overwrite_partitions(f_half, path, ["o_orderstatus"])

    after = {
        r[0]: r[1]
        for r in read_partitioned(spark, path)
        .groupBy("o_orderstatus")
        .count()
        .collect()
    }
    assert after["F"] == expected_f
    for status, n in before.items():
        if status != "F":
            assert after[status] == n, f"partition {status} must be untouched"

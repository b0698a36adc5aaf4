"""Incremental rollup maintenance: streaming per-batch merges must
equal one batch aggregation over all the data (additivity), across
multiple micro-batches."""

import os
import shutil

from pyspark.sql import functions as F

from datasette_upload_csvs_spark.sources.parquet import read_table
from datasette_upload_csvs_spark.streaming.rollup import (
    maintain_rollup_stream,
    read_rollup,
)


def _split_arrivals(full, tmp_path, src, n=3):
    for i in range(n):
        part = full.filter(F.pmod("o_orderkey", F.lit(n)) == i)
        part.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"p{i}"))
        name = [
            f for f in os.listdir(tmp_path / f"p{i}") if f.endswith(".parquet")
        ][0]
        shutil.copy(tmp_path / f"p{i}" / name, os.path.join(src, f"arrival_{i}.parquet"))


def test_incremental_rollup_high_cardinality(spark, sf_dir, tmp_path):
    """Rollup keyed per-orderkey (one group per input row): the merge
    must stay executor-side — no driver collect of O(groups) rows —
    and still equal the batch aggregate."""
    src = str(tmp_path / "orders_hc")
    os.makedirs(src)
    full = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    _split_arrivals(full, tmp_path, src)

    table = "rollup_orders_hc"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    n_batches = maintain_rollup_stream(
        spark,
        src,
        "o_orderkey bigint, o_totalprice double",
        table,
        keys=["o_orderkey"],
        sum_col="o_totalprice",
    )
    assert n_batches == 3
    rolled = read_rollup(spark, table)
    assert rolled.count() == full.count()  # one group per order, all kept
    got = {
        (r["o_orderkey"], r["n_rows"], round(r["sum_value"], 4))
        for r in rolled.collect()
    }
    want = {
        (r["o_orderkey"], 1, round(r["o_totalprice"], 4)) for r in full.collect()
    }
    assert got == want


def test_incremental_rollup_equals_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "orders_stream")
    os.makedirs(src)
    full = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    orders = full.drop("o_orderkey")
    # three arrival files → three micro-batches (maxFilesPerTrigger=1)
    for i in range(3):
        part = full.filter(F.pmod("o_orderkey", F.lit(3)) == i).drop("o_orderkey")
        part.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"p{i}"))
        name = [
            f for f in os.listdir(tmp_path / f"p{i}") if f.endswith(".parquet")
        ][0]
        shutil.copy(tmp_path / f"p{i}" / name, os.path.join(src, f"arrival_{i}.parquet"))

    table = "rollup_orders_status"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    n_batches = maintain_rollup_stream(
        spark,
        src,
        "o_orderstatus string, o_totalprice double",
        table,
        keys=["o_orderstatus"],
        sum_col="o_totalprice",
    )
    assert n_batches == 3

    got = {
        (r["o_orderstatus"], r["n_rows"], round(r["sum_value"], 4))
        for r in read_rollup(spark, table).collect()
    }
    want = {
        (r["o_orderstatus"], r["n_rows"], round(r["sum_value"], 4))
        for r in orders.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(28,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .collect()
    }
    assert got == want

"""In-place MERGE (upsert) on managed tables: staging-swap variant."""

from __future__ import annotations

from pyspark.sql import functions as F

from datasette_upload_csvs_spark.operators import merge
from datasette_upload_csvs_spark.sources.parquet import read_table


def test_merge_upsert_table_in_place(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    table = "merge_target"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    orders.write.saveAsTable(table)
    n0 = spark.table(table).count()

    updates = spark.createDataFrame(
        [(1, "U", 999.0), (-5, "I", 1.0)],
        "o_orderkey bigint, o_orderstatus string, o_totalprice double",
    )
    merge.merge_upsert(spark, table, updates, ["o_orderkey"])

    t = spark.table(table)
    assert t.count() == n0 + 1  # one update, one insert
    got = {r["o_orderkey"]: (r["o_orderstatus"], r["o_totalprice"])
           for r in t.filter(F.col("o_orderkey").isin([1, -5])).collect()}
    assert got == {1: ("U", 999.0), -5: ("I", 1.0)}
    assert not spark.catalog.tableExists(f"{table}__stage")

    # idempotent re-apply: same batch changes nothing further
    merge.merge_upsert(spark, table, updates, ["o_orderkey"])
    assert spark.table(table).count() == n0 + 1
    spark.sql(f"DROP TABLE IF EXISTS {table}")

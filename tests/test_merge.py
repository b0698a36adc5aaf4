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


def test_scd2_two_batches(spark, sf_dir):
    """Two successive SCD2 batches: exactly one live version per key,
    closed versions chain correctly."""
    from datasette_upload_csvs_spark.operators import merge as M

    c = read_table(spark, sf_dir, "customer").limit(50).select(
        "c_custkey", "c_acctbal"
    )
    cur = c.select(
        "c_custkey", "c_acctbal",
        F.lit("2020-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    b1 = c.filter(F.pmod("c_custkey", F.lit(2)) == 0).select(
        "c_custkey", (F.col("c_acctbal") + 1).alias("c_acctbal"))
    v1 = M.scd2_apply(cur, b1, ["c_custkey"],
                      F.lit("2021-01-01").cast("timestamp"))
    b2 = c.filter(F.pmod("c_custkey", F.lit(4)) == 0).select(
        "c_custkey", (F.col("c_acctbal") + 2).alias("c_acctbal"))
    v2 = M.scd2_apply(v1, b2, ["c_custkey"],
                      F.lit("2022-01-01").cast("timestamp")).persist()

    live = v2.filter(F.col("valid_to").isNull())
    assert live.count() == 50  # one live row per key
    assert live.select("c_custkey").distinct().count() == 50
    # a key updated in both batches has 3 versions with chained bounds
    k3 = v2.filter(F.pmod("c_custkey", F.lit(4)) == 0)
    per_key = k3.groupBy("c_custkey").count().collect()
    assert all(r["count"] == 3 for r in per_key)
    # closed intervals don't overlap: max(valid_to of closed) == live valid_from
    chained = (
        v2.filter(F.col("valid_to").isNotNull())
        .groupBy("c_custkey").agg(F.max("valid_to").alias("last_close"))
        .join(live.select("c_custkey", "valid_from"), "c_custkey")
        .filter(F.col("last_close") != F.col("valid_from"))
    )
    assert chained.count() == 0
    v2.unpersist()

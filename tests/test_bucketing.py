"""Bucketed-layout test: the join that pays its shuffle at write time.

Asserts the core scale property: joining two tables bucketed on the
join key plans ZERO Exchange operators, where the plain parquet join
plans one per side (or a broadcast).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datasette_upload_csvs_spark import plans
from datasette_upload_csvs_spark import queries as Q
from datasette_upload_csvs_spark.sources import write_bucketed


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    li = Q.load(spark, sf_dir, "lineitem")
    od = Q.load(spark, sf_dir, "orders")
    write_bucketed(li, "b_lineitem", ["l_orderkey"], num_buckets=8)
    write_bucketed(od, "b_orders", ["o_orderkey"], num_buckets=8)

    # disable broadcast so the join strategy is decided by layout
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bl, bo = spark.table("b_lineitem"), spark.table("b_orders")
        joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count("*").alias("n"))
        # grouping still shuffles; the JOIN itself must not
        # (reuse the pre-loaded frames: Q.load applies engine confs,
        # which would re-enable broadcast under us)
        plain = li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        bucketed_join_only = bl.join(bo, bl.l_orderkey == bo.o_orderkey)
        assert plans.shuffle_count(bucketed_join_only) == 0
        assert plans.shuffle_count(plain) >= 2
        # and the result is identical to the plain-join rollup
        got = {tuple(r) for r in joined.collect()}
        want = {
            tuple(r)
            for r in plain.groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")

"""ORC round-trip: the other columnar format Spark ships natively.

No DuckDB oracle (DuckDB reads no ORC), so parity is pinned against
the parquet-read frame itself: identical rows, pushdown still works.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datasette_upload_csvs_spark import plans
from datasette_upload_csvs_spark.sources.parquet import read_table


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    orders = read_table(spark, sf_dir, "orders")
    dst = str(tmp_path / "orders_orc")
    orders.write.format("orc").save(dst)

    back = spark.read.format("orc").load(dst)
    assert back.count() == orders.count()
    a = {tuple(r) for r in orders.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b

    filtered = back.filter(F.col("o_orderkey") == 7).select(
        "o_orderkey", "o_totalprice"
    )
    # predicate pushdown + column pruning hold for ORC scans too
    assert plans.has_pushed_filters(filtered)
    assert set(plans.read_schema_columns(filtered)) == {
        "o_orderkey",
        "o_totalprice",
    }

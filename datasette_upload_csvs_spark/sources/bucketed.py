"""Bucketed managed tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of lineitem⋈orders is the shuffle of both
sides on orderkey — every query, every time. Bucketing pays that
shuffle ONCE at write time: both tables hash-clustered into the same
number of buckets on the join key, so Catalyst plans a SortMergeJoin
with NO Exchange on either side (tests/test_bucketing.py asserts
exactly that). This is Spark's native equivalent of the co-located /
distribution-key storage that MPP warehouses use.

Guidance: bucket count ≈ (table size / 128 MB) rounded to a power of
two, identical on both join sides; bucket columns = the equi-join
key. Sorted buckets additionally let the merge join skip its sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist df as a bucketed (optionally sorted) managed table."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.format("parquet").saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, left: str, right: str) -> bool:
    """True if both managed tables exist (helper for callers choosing
    between the bucketed fast path and a plain join)."""
    return spark.catalog.tableExists(left) and spark.catalog.tableExists(right)

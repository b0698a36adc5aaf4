"""Hive-style partitioned parquet layout: directory-level data skipping.

At 100 TB, partition pruning is the difference between scanning the
lake and scanning one directory: a filter on a partition column is
resolved by the FILE INDEX before any task launches, so excluded
partitions cost zero I/O and zero tasks. Partition on low-cardinality,
always-filtered columns (ingest date, status, language); never on
high-cardinality keys — one directory per value is the classic
small-files failure (millions of tiny files, metadata-bound planning).

The reference keeps all rows in a single SQLite file and delegates
layout to its B-tree (reference `__init__.py:168` insert_all); a
Spark-native engine owns physical layout explicitly — this module is
that surface, alongside bucketing (`sources/bucketed.py`) for
join-key co-location.

Write discipline encoded here:
- `repartition(partition_cols)` before `partitionBy` → each partition
  directory is written by exactly one task → one right-sized file per
  partition instead of (tasks × partitions) shards.
- `maxRecordsPerFile` caps file size where a single partition is
  still huge (it splits within the writing task, no extra shuffle).
- dynamic partition overwrite (`partitionOverwriteMode=dynamic`)
  rewrites ONLY the partitions present in the incoming frame — the
  idempotent daily-backfill primitive; static mode would drop the
  whole table first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write df as hive-partitioned parquet with one file per
    partition (plus splits if max_records_per_file caps out)."""
    out = df.repartition(*partition_cols)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    writer = out.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(*partition_cols).parquet(path)


def overwrite_partitions(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Dynamic partition overwrite: replace only the partitions that
    appear in df, leaving all others untouched. Conf is set per-call
    and restored — callers shouldn't inherit dynamic mode silently."""
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        df.repartition(*partition_cols).write.mode("overwrite").partitionBy(
            *partition_cols
        ).parquet(path)
    finally:
        spark.conf.set(key, prev)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a hive-partitioned dataset (partition columns come back
    from directory names, discovery is recursive)."""
    return spark.read.parquet(path)


def scanned_files(df: DataFrame) -> list[str]:
    """The parquet files a (filtered) frame actually reads — the
    ground-truth pruning check: after a partition filter, every
    surviving path must contain that partition's directory."""
    return [
        r[0]
        for r in df.select(F.input_file_name().alias("f")).distinct().collect()
    ]

"""MERGE (upsert) for managed tables — no Delta/Iceberg dependency.

The reference's ingest path is append-only; a maintained analytics
store also needs "apply this batch of changed rows": update on key
match, insert otherwise. Without a transactional table format the
Spark-native shape is:

  kept   = target ANTI-JOIN updates ON keys   (rows not superseded)
  merged = kept UNION ALL updates

— one shuffle (the anti-join), no per-column coalesce, and the
update batch always wins wholesale. Persisting the merge uses the
same staging-table swap as streaming/rollup.py: write merged to
`{table}__stage` (reading the target while writing a DIFFERENT
table breaks the read-then-overwrite cycle), then DROP + RENAME.
Executor-side end to end — no driver materialization at any key
cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (callers' convenience)


def merge_upsert_frames(
    target: DataFrame, updates: DataFrame, keys: list[str]
) -> DataFrame:
    """Pure relational MERGE of two same-schema frames: rows of
    `target` whose key appears in `updates` are replaced; all
    update rows (matched or new) are kept."""
    kept = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    return kept.unionByName(updates)


def merge_upsert(
    spark: SparkSession, table: str, updates: DataFrame, keys: list[str]
) -> None:
    """Apply an update batch to a managed table in place (staging
    swap; see module docstring)."""
    merged = merge_upsert_frames(spark.table(table), updates, keys)
    stage = f"{table}__stage"
    merged.write.mode("overwrite").saveAsTable(stage)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"ALTER TABLE {stage} RENAME TO {table}")

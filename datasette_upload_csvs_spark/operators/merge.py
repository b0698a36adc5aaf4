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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert_frames(
    target: DataFrame, updates: DataFrame, keys: list[str]
) -> DataFrame:
    """Pure relational MERGE of two same-schema frames: rows of
    `target` whose key appears in `updates` are replaced; all
    update rows (matched or new) are kept."""
    kept = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    return kept.unionByName(updates)


def swap_stage(spark: SparkSession, stage: str, table: str) -> None:
    """Publish `stage` as `table` via DROP + RENAME.

    NOT atomic: the two catalog statements leave a window where a
    crash or a concurrent reader sees `table` missing entirely (the
    data itself is never lost — the stage table still holds it, and
    re-running the swap completes recovery). The session catalog's
    v1 tables support neither transactional RENAME-over nor CREATE
    OR REPLACE TABLE AS SELECT; with a v2 transactional format
    (Delta/Iceberg) this helper is where a real atomic
    replace/MERGE would slot in. Same caveat as
    sources/layout.py::compact_files."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"ALTER TABLE {stage} RENAME TO {table}")


def merge_upsert(
    spark: SparkSession, table: str, updates: DataFrame, keys: list[str]
) -> None:
    """Apply an update batch to a managed table in place (staging
    swap; see module docstring and swap_stage for the atomicity
    caveat)."""
    merged = merge_upsert_frames(spark.table(table), updates, keys)
    stage = f"{table}__stage"
    merged.write.mode("overwrite").saveAsTable(stage)
    swap_stage(spark, stage, table)


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str]
) -> DataFrame:
    """Classify every key across two same-schema snapshots:
    'added' (new only), 'removed' (old only), 'changed' (both, any
    non-key column differs), 'unchanged'. One full-outer join on the
    keys with md5-of-struct content comparison — the row-level diff
    that audits what a merge/CDC feed actually did.

    Content equality via a digest of the non-key struct keeps the
    comparison one expression regardless of column count (and null-
    safe: md5 of a struct with NULL fields is stable). Keys must be
    unique within each snapshot (it's a snapshot, not a log); a
    duplicated key would fan out in the full-outer join.
    """
    non_keys = [c for c in old.columns if c not in keys]
    digest = F.md5(F.to_json(F.struct(*[F.col(c) for c in non_keys])))
    o = old.select(*keys, digest.alias("_h_old"))
    n = new.select(*keys, digest.alias("_h_new"))
    j = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("_h_old").isNull(), "added")
        .when(F.col("_h_new").isNull(), "removed")
        .when(F.col("_h_old") != F.col("_h_new"), "changed")
        .otherwise("unchanged")
    )
    return j.select(*keys, status.alias("diff_status"))


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
    batch_ts,
    ts_from: str = "valid_from",
    ts_to: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type 2: versioned history instead of
    overwrite. `current` carries (attrs, valid_from, valid_to) with
    valid_to NULL marking the live version; `updates` carries the new
    attribute rows (no validity columns). One batch application:

      - live rows whose key is in the batch are CLOSED
        (valid_to = batch_ts);
      - every batch row OPENS a new live version
        (valid_from = batch_ts, valid_to = NULL);
      - history rows (valid_to already set) pass through untouched.

    `updates` must be key-unique: two rows for one key in a single
    batch would open two LIVE versions, breaking the one-live-row
    invariant. Batch callers dedupe first; the streaming path
    (streaming/cdc.py) compacts each micro-batch to the latest row
    per key before calling this.

    Change data capture reduced to one left-semi/anti pair plus a
    union — the same single-shuffle shape as merge_upsert_frames.
    Rows whose attributes did not change still version (simple, and
    deterministic for the oracle); pre-filter the batch against
    `current` to suppress no-op versions if storage matters.
    """
    ts = batch_ts if isinstance(batch_ts, Column) else F.lit(batch_ts)
    batch_keys = updates.select(*keys).distinct()
    history = current.filter(F.col(ts_to).isNotNull())
    live = current.filter(F.col(ts_to).isNull())
    closed = live.join(batch_keys, keys, "left_semi").withColumn(ts_to, ts)
    kept_live = live.join(batch_keys, keys, "left_anti")
    opened = updates.withColumn(ts_from, ts).withColumn(
        ts_to, F.lit(None).cast(current.schema[ts_to].dataType)
    )
    return (
        history.unionByName(kept_live).unionByName(closed).unionByName(opened)
    )

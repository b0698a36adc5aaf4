"""Idempotent per-epoch table writes for foreachBatch sinks.

Structured Streaming's foreachBatch is at-least-once: offsets commit
AFTER the sink returns, so a crash mid-batch replays the whole epoch.
Sinks that plain-append therefore double-write replayed rows. The
exactly-once recipe every stateful sink in this package uses:

  * every state table is partitioned by ``_batch_id`` (the epoch);
  * reads of history inside an epoch mask the epoch's OWN partition
    (``F.col("_batch_id") != epoch``) so a replay whose crash happened
    after a write still computes from the same inputs as the first
    attempt;
  * writes go through :func:`write_epoch_partition` — dynamic
    partition overwrite, so a replay REWRITES its partition instead of
    appending a second copy.

at-least-once delivery x (masked reads + idempotent partitioned
writes) = exactly-once table contents. Proven by the replay tests in
tests/test_curation_stream.py, tests/test_split_stream.py, and
tests/test_ann_stream.py.

Compaction (round-8): one partition per epoch forever is the classic
small-file / partition-explosion failure at 100 TB-stream epoch
counts. :func:`compact_state_table` folds all CLOSED epochs
(``_batch_id < before_epoch``) into one BASE partition
(``_batch_id = -1``) so the partition count stays bounded at
base + open epochs, while the replay mask stays correct: the open
epoch's partition is never folded, so ``_batch_id != epoch`` masks
exactly what it did before. The fold is crash-repairable from
job-level atomicity alone (Spark's committed writes appear all or
not at all): it stages the merged history under a partition id that
ENCODES the watermark (``-(2 + before_epoch)``), so a re-run can
tell which of its four steps completed and resume — never
recomputing the merge from an already-promoted base (the
double-count hazard). Readers go through :func:`read_state`, which
masks the open epoch AND anything below the base id, so a staging
partition left by a crashed compaction is invisible to the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the compacted-history partition: all folded closed epochs live here
BASE_EPOCH = -1


def _staging_id(before_epoch: int) -> int:
    """Staging partition id for a fold up to `before_epoch` — the
    watermark rides in the id so a crashed run is resumable."""
    return -(2 + before_epoch)


def write_epoch_partition(
    out: DataFrame, table: str, part_col: str = "_batch_id"
) -> None:
    """Write ``out`` (which must carry a ``part_col`` column) into
    ``table`` under dynamic partition overwrite: only the partitions
    present in ``out`` are replaced, all other epochs' partitions are
    untouched. Creates the table (partitioned by ``part_col``) on
    first use."""
    spark = out.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "dynamic")
    try:
        if not spark.catalog.tableExists(table):
            out.write.mode("overwrite").partitionBy(part_col).saveAsTable(
                table
            )
        else:
            # insertInto is positional: align to the table column order
            cols = spark.table(table).columns
            out.select(*cols).write.mode("overwrite").insertInto(table)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def read_state(spark, table: str, mask_epoch: int) -> DataFrame:
    """History read of a state table inside epoch `mask_epoch`: masks
    the epoch's OWN partition (the replay rule) and everything below
    BASE_EPOCH (staging partitions a crashed compaction may have left
    — without this guard a lingering staging would double-count the
    history it duplicates)."""
    return spark.table(table).filter(
        (F.col("_batch_id") != mask_epoch)
        & (F.col("_batch_id") >= BASE_EPOCH)
    )


def compact_state_table(
    spark,
    table: str,
    before_epoch: int,
    target_files: int = 8,
    part_col: str = "_batch_id",
    sort_cols: list | None = None,
) -> int:
    """Fold every closed epoch partition (0 ≤ _batch_id <
    before_epoch) into the BASE partition. Returns the number of
    epoch partitions folded.

    Run QUIESCED (between micro-batches / from a maintenance job) —
    never concurrently with an epoch that reads this table. Crash
    anywhere and simply re-run with the same `before_epoch`: each
    step is one job-atomic Spark write or metadata drop, and the
    staging id encodes the watermark, so the re-run resumes at the
    right step instead of re-merging into an already-promoted base:

      1. stage  : staging(-(2+W)) ← base(-1) ∪ epochs [0, W)
                  (skipped when staging exists — that is exactly the
                  signal the merge already committed);
      2. promote: base(-1) ← staging (dynamic overwrite; idempotent);
      3. drop the folded epoch partitions (DROP IF EXISTS);
      4. drop staging (and any stale staging from older watermarks).

    The caller picks `before_epoch`; the OPEN epoch (and any epoch
    the engine could still replay) must be above it — with Structured
    Streaming's single-inflight-epoch contract, `current_epoch` is
    always safe. `target_files` coalesces the folded history so the
    base partition is few large files, not the sum of every epoch's
    small ones (the other half of the small-file failure).

    Cost model: each fold rewrites the base once — O(history) — and
    the merge transits the (spillable, MEMORY_AND_DISK) block manager
    via localCheckpoint, because Spark's self-insert check is
    table-level and would otherwise refuse the read-and-overwrite.
    Pick compact_every so the amortized O(history/N) per epoch is
    acceptable; at very large state, tier the folds (generational
    bases) the way LSM stores do — the staging/promote protocol here
    generalizes unchanged.

    ``part_col`` names the epoch/batch partition column — the fold is
    the same for any integer-partitioned state table (the maintained
    ShingleIndex reuses it with part_col="batch"). ``sort_cols``
    sorts the folded base within its files (postings tables keep
    their shingle-sorted row groups through folds)."""
    if not spark.catalog.tableExists(table):
        return 0
    # invoked from the same foreachBatch threads whose epoch readers
    # document stale cached file listings — a stale listing here makes
    # the fold silently skip recently closed epoch partitions (content
    # stays correct, but the bounded-partition guarantee degrades)
    spark.catalog.refreshTable(table)
    stg = _staging_id(before_epoch)
    part_ids = [
        r[part_col]
        for r in spark.table(table).select(part_col).distinct().collect()
    ]
    window = sorted(p for p in part_ids if 0 <= p < before_epoch)
    stale = [p for p in part_ids if p < BASE_EPOCH and p != stg]
    if not window and stg not in part_ids:
        _drop_partitions(spark, table, stale, part_col)
        return 0
    cols = spark.table(table).columns
    if stg not in part_ids:
        merged = (
            spark.table(table)
            .filter(
                (F.col(part_col) == BASE_EPOCH)
                | ((F.col(part_col) >= 0) & (F.col(part_col) < before_epoch))
            )
            .withColumn(part_col, F.lit(stg))
            .select(*cols)
            .coalesce(max(1, target_files))
        )
        if sort_cols:
            merged = merged.sortWithinPartitions(*sort_cols)
        # materialize OFF the table before overwriting it (Spark
        # refuses, correctly, to overwrite a table it is reading)
        write_epoch_partition(merged.localCheckpoint(), table, part_col)
    promoted = (
        spark.table(table)
        .filter(F.col(part_col) == stg)
        .withColumn(part_col, F.lit(BASE_EPOCH))
        .select(*cols)
        .localCheckpoint()
    )
    write_epoch_partition(promoted, table, part_col)
    _drop_partitions(spark, table, window, part_col)
    _drop_partitions(spark, table, [stg] + stale, part_col)
    return len(window)


def _drop_partitions(spark, table: str, ids, part_col: str = "_batch_id") -> None:
    if not ids:
        return
    specs = ", ".join(f"PARTITION ({part_col}={int(i)})" for i in ids)
    spark.sql(f"ALTER TABLE {table} DROP IF EXISTS {specs}")

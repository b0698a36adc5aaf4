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
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_epoch_partition(out: DataFrame, table: str) -> None:
    """Write ``out`` (which must carry a ``_batch_id`` column) into
    ``table`` under dynamic partition overwrite: only the partitions
    present in ``out`` are replaced, all other epochs' partitions are
    untouched. Creates the table (partitioned by ``_batch_id``) on
    first use."""
    spark = out.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "dynamic")
    try:
        if not spark.catalog.tableExists(table):
            out.write.mode("overwrite").partitionBy("_batch_id").saveAsTable(
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

"""Streaming change-data-capture: a type-2 dimension maintained from
an update stream.

Each micro-batch is one SCD2 application (operators/merge.scd2_apply)
against the stored dimension, persisted with the staging-table swap —
the same executor-side pattern as streaming/rollup.py, so dimension
cardinality never lands on the driver. foreachBatch is the right sink
because the merge must read the CURRENT dimension table (stream-batch
join against mutable state), which no declarative streaming sink
expresses.

Batch timestamps come from a column of the update stream (event
time), not wall clock — replays produce identical history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datasette_upload_csvs_spark.operators.merge import scd2_apply, swap_stage


def maintain_scd2_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    table: str,
    keys: list[str],
    ts_col: str,
) -> int:
    """Drain a parquet directory stream of update rows into an SCD2
    dimension table (Trigger.AvailableNow). Update rows carry
    `ts_col` (the change's event time); the stored table gains
    valid_from/valid_to. Returns micro-batches processed.

    Within one micro-batch only the LATEST row per key applies (the
    standard CDC compaction rule); its ts stamps the whole batch
    application, so versions are ordered per key as long as the
    stream is (per-key ordering is the source's contract, as with
    any CDC log)."""
    batches = {"n": 0}

    def sink(batch_df: DataFrame, _epoch: int) -> None:
        if batch_df.isEmpty():
            return
        latest = F.struct(F.col(ts_col), *[F.col(c) for c in batch_df.columns
                                           if c not in (*keys, ts_col)])
        compacted = (
            batch_df.groupBy(*keys)
            .agg(F.max(latest).alias("_l"))
            .select(*keys, F.col(f"_l.{ts_col}").alias(ts_col),
                    *[F.col(f"_l.{c}") for c in batch_df.columns
                      if c not in (*keys, ts_col)])
        )
        batch_ts = compacted.agg(F.max(ts_col)).collect()[0][0]
        updates = compacted.drop(ts_col)
        if not spark.catalog.tableExists(table):
            current = updates.limit(0).select(
                "*",
                F.lit(None).cast("timestamp").alias("valid_from"),
                F.lit(None).cast("timestamp").alias("valid_to"),
            )
        else:
            current = spark.table(table)
        merged = scd2_apply(current, updates, keys, F.lit(batch_ts))
        stage = f"{table}__stage"
        merged.write.mode("overwrite").saveAsTable(stage)
        # swap_stage is NOT atomic (DROP→RENAME window); on crash the
        # stage table still holds the merged state for recovery
        swap_stage(spark, stage, table)
        batches["n"] += 1

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return batches["n"]

"""Incrementally-maintained rollup: the pre-aggregation pattern that
replaces full rescans at 100 TB.

A dashboard query over raw facts re-scans everything; a maintained
rollup touches only each arriving micro-batch. The trick that makes
it exact is ADDITIVITY: keep per-group partial states (count, exact
decimal sums), combine batch states into the stored table by
re-aggregating their union, and derive ratios (averages) at read
time. SUM/COUNT states merge losslessly; this is the same
partial/final split Catalyst uses inside a single aggregation,
promoted to cross-batch persistence.

foreachBatch is the right sink: the rollup table is O(groups) —
tiny — so rewriting it per batch is cheaper than any merge
machinery, and the write stays transactional per micro-batch
(overwrite of a managed table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _batch_state(df: DataFrame, keys: list[str], sum_col: str) -> DataFrame:
    return df.groupBy(*keys).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col(sum_col).cast("decimal(28,4)")).alias("sum_state"),
    )


def merge_rollup(
    spark: SparkSession, state: DataFrame, table: str, keys: list[str]
) -> None:
    """Combine a batch's partial state into the stored rollup: union
    with the existing states and re-aggregate (additive merge).

    The merge stays entirely executor-side: the merged frame is
    written to a staging table (reading the current rollup while
    writing a *different* table breaks the read-then-overwrite
    cycle without materializing on the driver), then swapped in via
    DROP + RENAME (operators/merge.py::swap_stage — NOT atomic; a
    reader between the two statements sees the table missing). This
    keeps high-cardinality rollup keys (e.g. per-user, 100M groups
    at corpus scale) distributed — no O(groups) driver allocation
    ever happens.
    """
    from datasette_upload_csvs_spark.operators.merge import swap_stage

    if spark.catalog.tableExists(table):
        state = spark.table(table).unionByName(state)
    merged = state.groupBy(*keys).agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("sum_state").alias("sum_state"),
    )
    stage = f"{table}__stage"
    merged.write.mode("overwrite").saveAsTable(stage)
    swap_stage(spark, stage, table)


def maintain_rollup_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    table: str,
    keys: list[str],
    sum_col: str,
) -> int:
    """Drain a parquet directory stream into an incrementally
    maintained rollup table (Trigger.AvailableNow). Returns the
    number of micro-batches processed."""
    batches = {"n": 0}

    def sink(batch_df: DataFrame, _epoch: int) -> None:
        if batch_df.isEmpty():
            return
        merge_rollup(spark, _batch_state(batch_df, keys, sum_col), table, keys)
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


def read_rollup(spark: SparkSession, table: str) -> DataFrame:
    """Read-time finalization: exact sums to double, avg derived."""
    return spark.table(table).select(
        "*",
        F.col("sum_state").cast("double").alias("sum_value"),
        (F.col("sum_state").cast("double") / F.col("n_rows")).alias("avg_value"),
    ).drop("sum_state")

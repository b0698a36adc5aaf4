"""Incremental NEAR-duplicate detection: new documents checked
against everything already ingested, without re-scanning history.

The batch near-dup pipeline (operators/dedup.py) is all-pairs within
one corpus snapshot. A training-data ingest needs the incremental
question instead: "is this NEW document a near-dup of anything seen
BEFORE?" — answered per micro-batch against a maintained LSH band
index:

  per batch:  signatures(new docs) → band keys
              ⋈ stored band table          → new-vs-history candidates
              ⋈ batch's own band keys       → new-vs-new candidates
              exact-verify candidates (Jaccard on shingle-hash sets)
              append verified pairs; append new bands to the index

State is the band table — O(corpus × bands) small keys, a TABLE, not
executor memory, so it survives restarts and scales with storage.
Each batch's work is proportional to the batch and its candidates,
never to corpus history. foreachBatch because the index is read AND
appended within one batch (mutable-state join, like streaming/cdc.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datasette_upload_csvs_spark.operators.dedup import (
    _hash_shingle_frame,
    _signatures_from_hashes,
    _MERSENNE,
)


def _bands(sig: DataFrame, bands: int, rows: int) -> DataFrame:
    band_sql = "array(" + ",".join(
        f"struct({i} AS band, xxhash64("
        + ",".join(f"element_at(signature, {i * rows + j + 1})" for j in range(rows))
        + ") AS bucket)"
        for i in range(bands)
    ) + ")"
    return sig.select(
        "doc_id", F.explode(F.expr(band_sql)).alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")


def maintain_near_dup_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    pairs_table: str,
    index_table: str,
    threshold: float = 0.7,
    num_perm: int = 128,
    n_bands: int = 32,
    checkpoint_dir: str | None = None,
) -> int:
    """Drain a parquet stream of (doc_id, text) into near-dup PAIRS
    (pairs_table) while maintaining the LSH band index + shingle-set
    store (index_table, index_table + '__sets'). Trigger.AvailableNow;
    returns micro-batches processed. Pair direction: id_a < id_b, so
    batch-vs-history and in-batch pairs land identically to a batch
    run over the full corpus (verified by test).

    `checkpoint_dir` makes the stream RESUMABLE: a stopped/killed
    query restarted with the same checkpoint skips already-committed
    source files, so the maintained index keeps extending instead of
    reprocessing history (restart test proves index == batch-rebuilt).
    Recovery grain is the micro-batch: foreachBatch offsets commit
    AFTER the sink returns, so a kill mid-batch replays that whole
    batch on restart — the three appends (pairs/bands/sets) would
    then double-apply that batch's rows. At this state shape the fix
    is an epoch-keyed idempotent append (stage each batch under its
    epoch id and MERGE); kept out of the default path because the
    common failure (kill BETWEEN batches, e.g. a drained
    availableNow run) recovers exactly."""
    rows = num_perm // n_bands
    sets_table = f"{index_table}__sets"
    batches = {"n": 0}

    def sink(batch_df: DataFrame, _epoch: int) -> None:
        if batch_df.isEmpty():
            return
        sets = _hash_shingle_frame(batch_df, "text", "doc_id", 3).persist()
        hashed = sets.select(
            "doc_id",
            F.explode(
                F.transform("sh", lambda h: F.pmod(h, F.lit(_MERSENNE)))
            ).alias("h"),
        )
        sig = _signatures_from_hashes(hashed, "doc_id", num_perm)
        new_bands = _bands(sig, n_bands, rows).persist()

        have_index = spark.catalog.tableExists(index_table)
        if have_index:
            # the session caches table file listings; inside a
            # foreachBatch thread a previous batch's append is NOT
            # automatically visible — without the refresh, batch N
            # joins against batch N-2's index and silently misses
            # pairs (observed: stale index_rows across epochs)
            spark.catalog.refreshTable(index_table)
            old_bands = spark.table(index_table)
            all_bands = old_bands.unionByName(new_bands)
        else:
            all_bands = new_bands
        # candidates where at least one side is NEW: join new bands
        # against (old + new); a<b dedups the in-batch mirror pairs
        cand = (
            new_bands.alias("a")
            .join(all_bands.alias("b"), ["band", "bucket"])
            .filter(F.col("a.doc_id") != F.col("b.doc_id"))
            .select(
                F.least("a.doc_id", "b.doc_id").alias("id_a"),
                F.greatest("a.doc_id", "b.doc_id").alias("id_b"),
            )
            .distinct()
        )
        if spark.catalog.tableExists(sets_table):
            spark.catalog.refreshTable(sets_table)
            all_sets = spark.table(sets_table).unionByName(sets)
        else:
            all_sets = sets
        a = all_sets.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
        b = all_sets.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
        shared = F.size(F.array_intersect("sh_a", "sh_b"))
        denom = F.size("sh_a") + F.size("sh_b") - shared
        pairs = (
            cand.join(a, "id_a")
            .join(b, "id_b")
            .withColumn("jaccard", shared.cast("double") / denom.cast("double"))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
        pairs.write.mode("append").saveAsTable(pairs_table)
        new_bands.write.mode("append").saveAsTable(index_table)
        sets.write.mode("append").saveAsTable(sets_table)
        sets.unpersist()
        new_bands.unpersist()
        batches["n"] += 1

    writer = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return batches["n"]

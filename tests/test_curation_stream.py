"""Incremental curation annotations must equal the batch run over the
full corpus, regardless of arrival batching, and never double-annotate
a document across checkpointed restarts."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from datasette_upload_csvs_spark.sources.parquet import read_table
from datasette_upload_csvs_spark.streaming.curation_stream import (
    annotate,
    annotate_stream,
)

SCHEMA = "doc_id bigint, text string"


def _stage_arrivals(docs, tmp_path, parts=3):
    src = str(tmp_path / "docs_stream")
    os.makedirs(src)
    for i in range(parts):
        part = docs.filter(F.pmod("doc_id", F.lit(parts)) == i)
        d = str(tmp_path / f"p{i}")
        part.coalesce(1).write.mode("overwrite").parquet(d)
        name = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        shutil.copy(
            os.path.join(d, name), os.path.join(src, f"arrival_{i}.parquet")
        )
    return src


def test_stream_annotations_equal_batch(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = _stage_arrivals(docs, tmp_path)
    spark.sql("DROP TABLE IF EXISTS curation_ann")

    n = annotate_stream(
        spark, src, SCHEMA, "curation_ann",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert n == 3  # maxFilesPerTrigger=1 → one batch per arrival file

    ann = spark.table("curation_ann").drop("_batch_id")
    got = {tuple(r) for r in ann.collect()}
    want = {tuple(r) for r in annotate(docs).collect()}
    assert got == want and got
    # exactly one row per doc
    assert spark.table("curation_ann").count() == docs.count()

    # restart with the SAME checkpoint: no files left -> no batches,
    # no duplicate annotations
    n2 = annotate_stream(
        spark, src, SCHEMA, "curation_ann",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert spark.table("curation_ann").count() == docs.count(), n2
    spark.sql("DROP TABLE IF EXISTS curation_ann")


def test_replayed_batch_does_not_duplicate(spark, sf_dir):
    """foreachBatch is at-least-once: simulate the crash-after-write-
    before-offset-commit recovery by writing the SAME epoch twice.
    The _batch_id dynamic partition overwrite must leave table
    contents identical, not doubled."""
    from datasette_upload_csvs_spark.streaming.curation_stream import (
        _write_batch,
    )

    docs = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .limit(40)
    )
    spark.sql("DROP TABLE IF EXISTS curation_ann_replay")
    out = annotate(docs).withColumn("_batch_id", F.lit(7))
    _write_batch(out, "curation_ann_replay")
    first = spark.table("curation_ann_replay").count()
    _write_batch(out, "curation_ann_replay")  # the replay
    assert spark.table("curation_ann_replay").count() == first == 40
    # a LATER epoch still appends normally
    out2 = (
        annotate(docs)
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
        .withColumn("_batch_id", F.lit(8))
    )
    _write_batch(out2, "curation_ann_replay")
    assert spark.table("curation_ann_replay").count() == 80
    spark.sql("DROP TABLE IF EXISTS curation_ann_replay")


def test_stream_annotations_with_compaction(spark, sf_dir, tmp_path):
    # compact_every=2 over 4 arrivals: content identical to the batch
    # run, partition count bounded at base + epochs-since-last-fold
    from datasette_upload_csvs_spark.streaming.epoch_write import BASE_EPOCH

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = _stage_arrivals(docs, tmp_path, parts=4)
    spark.sql("DROP TABLE IF EXISTS curation_ann_c")
    n = annotate_stream(
        spark, src, SCHEMA, "curation_ann_c", compact_every=2
    )
    assert n == 4
    ann = spark.table("curation_ann_c")
    got = {tuple(r) for r in ann.drop("_batch_id").collect()}
    want = {tuple(r) for r in annotate(docs).collect()}
    assert got == want and ann.count() == docs.count()
    parts = sorted(
        r["_batch_id"] for r in ann.select("_batch_id").distinct().collect()
    )
    assert parts[0] == BASE_EPOCH and len(parts) <= 3, parts
    spark.sql("DROP TABLE IF EXISTS curation_ann_c")

"""The four streaming curation components compose end-to-end on ONE
corpus: ingest arrivals → curation annotations → near-dup text pairs
+ embedding ANN pairs → frozen split labels, all maintained from the
same multi-batch arrival with shared state tables in one session.

Each component has its own stream==batch proof; this test proves the
COMPOSITION: draining all four over the same 3-batch arrival yields
tables equal to the batch twins over the full corpus snapshot, and a
curated train/val derivation joining all four streaming tables equals
the same derivation from the batch pipeline's outputs.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from datasette_upload_csvs_spark.operators import dedup, splits
from datasette_upload_csvs_spark.operators.shingle_index import ShingleIndex
from datasette_upload_csvs_spark.sources.parquet import read_table
from datasette_upload_csvs_spark.streaming import split_stream
from datasette_upload_csvs_spark.streaming.ann_stream import (
    embedding_ann_batch,
    maintain_embedding_ann_stream,
)
from datasette_upload_csvs_spark.streaming.curation_stream import (
    annotate,
    annotate_stream,
)
from datasette_upload_csvs_spark.streaming.near_dup_stream import (
    maintain_near_dup_stream,
)

DOC_SCHEMA = "doc_id bigint, text string"
EMB_SCHEMA = "vec_id bigint, embedding array<float>"

TABLES = (
    "pipe_ann",
    "pipe_nd_pairs", "pipe_nd_index", "pipe_nd_index__sets",
    "pipe_emb_pairs", "pipe_emb_index", "pipe_emb_index__vecs",
    "pipe_splits",
)


def _land(df, key_col, n_batches, out_dir, tmp_path, tag):
    """Split df into n_batches by pmod(key) and land one arrival file
    per batch, in batch order (file-source processing order)."""
    os.makedirs(out_dir, exist_ok=True)
    parts = []
    for i in range(n_batches):
        part = df.filter(F.pmod(key_col, F.lit(n_batches)) == i)
        d = str(tmp_path / f"{tag}{i}")
        part.coalesce(1).write.mode("overwrite").parquet(d)
        name = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(d, name),
                    os.path.join(out_dir, f"arrival_{i}.parquet"))
        parts.append(part)
    return parts


def _curated_split_view(spark, ann, nd_pairs, emb_pairs, split_rows):
    """The composed curation derivation: documents the annotation
    stage keeps, minus near-dup losers (text OR embedding — the
    larger id of each verified pair loses, the standard keep-first
    rule), labeled with their frozen split."""
    keep = ann.filter(F.col("keep")).select("doc_id")
    text_losers = nd_pairs.select(F.col("id_b").alias("doc_id")).distinct()
    emb_losers = emb_pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return {
        (r["doc_id"], r["split"])
        for r in keep.join(text_losers, "doc_id", "left_anti")
        .join(emb_losers, "doc_id", "left_anti")
        .join(split_rows.select("doc_id", "split"), "doc_id")
        .collect()
    }


def test_streaming_curation_pipeline_composes(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    # embeddings share the documents' id space at the fixtures —
    # treat vec_id as the doc's embedding vector id
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    n_batches = 3

    doc_src = str(tmp_path / "doc_arrivals")
    emb_src = str(tmp_path / "emb_arrivals")
    doc_parts = _land(docs, "doc_id", n_batches, doc_src, tmp_path, "d")
    _land(emb, "vec_id", n_batches, emb_src, tmp_path, "e")

    idx = ShingleIndex(spark, "pipe_idx")
    idx.drop()
    for t in TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        # ---- drive all four streams over the same arrival set
        n1 = annotate_stream(
            spark, doc_src, DOC_SCHEMA, "pipe_ann",
            checkpoint_dir=str(tmp_path / "ck_ann"),
        )
        n2 = maintain_near_dup_stream(
            spark, doc_src, DOC_SCHEMA,
            pairs_table="pipe_nd_pairs", index_table="pipe_nd_index",
            threshold=0.7, checkpoint_dir=str(tmp_path / "ck_nd"),
        )
        n3 = maintain_embedding_ann_stream(
            spark, emb_src, EMB_SCHEMA,
            pairs_table="pipe_emb_pairs", index_table="pipe_emb_index",
            threshold=0.99, checkpoint_dir=str(tmp_path / "ck_emb"),
        )
        n4 = split_stream.assign_splits_stream(
            spark, doc_src, DOC_SCHEMA, idx, "pipe_splits",
            checkpoint_dir=str(tmp_path / "ck_split"),
        )
        assert (n1, n2, n3, n4) == (3, 3, 3, 3)
        spark.catalog.clearCache()

        # ---- each maintained table equals its batch twin over the
        # full corpus snapshot
        ann_stream_rows = {
            tuple(r)
            for r in spark.table("pipe_ann")
            .drop("_batch_id")
            .collect()
        }
        ann_batch_rows = {tuple(r) for r in annotate(docs).collect()}
        assert ann_stream_rows == ann_batch_rows and ann_stream_rows

        nd_stream = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in spark.table("pipe_nd_pairs").collect()
        }
        nd_batch = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in dedup.minhash_near_dup_pairs(
                docs, threshold=0.7
            ).collect()
        }
        assert nd_stream == nd_batch

        emb_stream = {
            (r["id_a"], r["id_b"], r["cos_sim"])
            for r in spark.table("pipe_emb_pairs").collect()
        }
        emb_batch = {
            (r["id_a"], r["id_b"], r["cos_sim"])
            for r in embedding_ann_batch(emb, threshold=0.99).collect()
        }
        assert emb_stream == emb_batch

        # ---- the split labels equal the sequential batch path over
        # the same arrival order (the batch pipeline's incremental
        # form — labels frozen per batch)
        idx2 = ShingleIndex(spark, "pipe_idx_ref")
        idx2.drop()
        try:
            prev = spark.createDataFrame([], split_stream._EMPTY_SPLITS)
            for i, part in enumerate(doc_parts):
                prev = splits.append_splits_from_index(
                    prev, idx2, part, batch=i
                )
                prev = spark.createDataFrame(prev.collect(), prev.schema)
                spark.catalog.clearCache()
            want_splits = {
                r["doc_id"]: (r["cluster_id"], r["split"], r["bridged"])
                for r in prev.collect()
            }
        finally:
            idx2.drop()
        got_splits = {
            r["doc_id"]: (r["cluster_id"], r["split"], r["bridged"])
            for r in spark.table("pipe_splits").collect()
        }
        assert got_splits == want_splits
        assert set(got_splits) == {r["doc_id"] for r in docs.collect()}

        # ---- the composed curation derivation (keep ∧ not-near-dup
        # ∧ labeled) is identical whether read from the four
        # streaming tables or from the batch twins
        got_view = _curated_split_view(
            spark,
            spark.table("pipe_ann"),
            spark.table("pipe_nd_pairs"),
            spark.table("pipe_emb_pairs"),
            spark.table("pipe_splits"),
        )
        want_view = _curated_split_view(
            spark,
            annotate(docs),
            dedup.minhash_near_dup_pairs(docs, threshold=0.7),
            embedding_ann_batch(emb, threshold=0.99),
            prev,
        )
        assert got_view == want_view and got_view
        # cluster-safety survives the composition: a non-bridged
        # cluster never straddles train/val in the curated view
        by_cluster = {}
        for doc_id, split in got_view:
            cid, _, bridged = got_splits[doc_id]
            if not bridged:
                by_cluster.setdefault(cid, set()).add(split)
        assert all(len(s) == 1 for s in by_cluster.values())
    finally:
        idx.drop()
        for t in TABLES:
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.catalog.clearCache()

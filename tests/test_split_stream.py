"""Streaming leakage-safe split assignment (streaming/split_stream):
stream == batch, frozen labels across restarts, and exactly-once
table contents under at-least-once redelivery (the replay reruns a
full epoch against stores the first attempt already mutated).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datasette_upload_csvs_spark.operators import splits
from datasette_upload_csvs_spark.operators.shingle_index import ShingleIndex
from datasette_upload_csvs_spark.streaming import split_stream

SCHEMA = "doc_id long, text string"


def _batches():
    base = " ".join(f"c{i}" for i in range(40))
    b0 = [(1, base + " xa"), (2, base + " xb"),
          (10, " ".join(f"a10b{j}" for j in range(12)))]
    b1 = [(3, base + " xc"),                      # adopts cluster 1
          (21, " ".join(f"u21v{j}" for j in range(12)))]
    b2 = [(4, base + " xd"),                      # adopts cluster 1
          (22, " ".join(f"u21v{j}" for j in range(12)))]  # dups doc 21
    return [b0, b1, b2]


def _rows(df):
    return {
        r["doc_id"]: (r["cluster_id"], r["split"], r["bridged"])
        for r in df.collect()
    }


def test_stream_equals_batch_and_survives_replay_and_restart(
    spark, tmp_path
):
    batches = _batches()
    src = tmp_path / "stream-src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    idx = ShingleIndex(spark, "tstrm")
    idx.drop()
    spark.sql("DROP TABLE IF EXISTS tstrm_splits")
    try:
        # drain the first two batches (one file per micro-batch)
        for i, b in enumerate(batches[:2]):
            spark.createDataFrame(b, SCHEMA).coalesce(1).write.parquet(
                str(src / f"b{i}")
            )
        n = split_stream.assign_splits_stream(
            spark, str(src) + "/*", SCHEMA, idx, "tstrm_splits",
            checkpoint_dir=ckpt,
        )
        assert n == 2
        spark.catalog.clearCache()

        got2 = _rows(spark.table("tstrm_splits"))

        # ground truth: the sequential batch path over the same
        # batches on its own index
        idx2 = ShingleIndex(spark, "tstrmref")
        idx2.drop()
        try:
            prev = spark.createDataFrame([], split_stream._EMPTY_SPLITS)
            truths = []
            for i, b in enumerate(batches):
                prev = splits.append_splits_from_index(
                    prev, idx2, spark.createDataFrame(b, SCHEMA), batch=i
                )
                prev = spark.createDataFrame(prev.collect(), prev.schema)
                truths.append(_rows(prev))
                spark.catalog.clearCache()
        finally:
            idx2.drop()
        assert got2 == truths[1]

        # ---- at-least-once replay of a completed epoch: both stores
        # already contain epoch 1; the rerun must leave every table
        # byte-identical (exclude_batch masks the index, the
        # _batch_id filter masks the splits table, writes overwrite)
        split_stream.assign_batch(
            spark, idx, "tstrm_splits",
            spark.createDataFrame(batches[1], SCHEMA), epoch=1,
        )
        spark.catalog.clearCache()
        assert _rows(spark.table("tstrm_splits")) == truths[1]
        n_commits = (
            spark.table("tstrm_commits").select("batch").distinct().count()
        )
        assert n_commits == 2

        # ---- restart with the same checkpoint: only the NEW file is
        # processed; existing labels stay frozen (doc 4 adopts the
        # batch-0 cluster, doc 22 adopts 21's frozen split)
        spark.createDataFrame(batches[2], SCHEMA).coalesce(1).write.parquet(
            str(src / "b2")
        )
        n = split_stream.assign_splits_stream(
            spark, str(src) + "/*", SCHEMA, idx, "tstrm_splits",
            checkpoint_dir=ckpt,
        )
        assert n == 1  # resumed from offsets: one fresh micro-batch
        spark.catalog.clearCache()
        final = _rows(spark.table("tstrm_splits"))
        assert final == truths[2]
        for d, row in got2.items():  # frozen labels
            assert final[d] == row
        assert final[4][0] == 1 and final[4][1] == final[1][1]
        assert final[22][0] == final[21][0] and final[22][1] == final[21][1]
    finally:
        idx.drop()
        spark.sql("DROP TABLE IF EXISTS tstrm_splits")
        spark.catalog.clearCache()


def test_stream_with_index_compaction_equals_uncompacted(spark, tmp_path):
    """compact_every folds BOTH stores (splits table + shingle index,
    round 9) mid-stream; labels and subsequent edge-driven adoption
    must be identical to an uncompacted twin stream, and the index's
    partition count must stay bounded."""
    base = " ".join(f"c{i}" for i in range(40))
    batches = [
        [(100 * b, base + f" x{b}"),
         (100 * b + 1, " ".join(f"u{b}v{j}" for j in range(12)))]
        for b in range(6)
    ]
    # make batch 5 near-dup batch 0's unique doc so a post-fold edge
    # must come out of the BASE partition
    batches[5][1] = (501, " ".join(f"u0v{j}" for j in range(12)))

    def drain(tag, compact_every):
        src = tmp_path / f"src-{tag}"
        src.mkdir()
        idx = ShingleIndex(spark, f"tcmp_{tag}")
        idx.drop()
        spark.sql(f"DROP TABLE IF EXISTS tcmp_{tag}_splits")
        for i, b in enumerate(batches):
            spark.createDataFrame(b, SCHEMA).coalesce(1).write.parquet(
                str(src / f"b{i}")
            )
        n = split_stream.assign_splits_stream(
            spark, str(src) + "/*", SCHEMA, idx, f"tcmp_{tag}_splits",
            checkpoint_dir=str(tmp_path / f"ckpt-{tag}"),
            compact_every=compact_every,
        )
        assert n == 6
        spark.catalog.clearCache()
        return idx, _rows(spark.table(f"tcmp_{tag}_splits"))

    idx_c, got = drain("fold", compact_every=2)
    idx_u, want = drain("plain", compact_every=None)
    try:
        assert got == want
        # the near-dup across the fold boundary adopted batch 0's
        # cluster — the edge came from folded (base) index rows
        assert got[501][0] == got[1][0]
        n_parts = spark.sql(
            f"SHOW PARTITIONS {idx_c.postings}"
        ).count()
        n_parts_u = spark.sql(
            f"SHOW PARTITIONS {idx_u.postings}"
        ).count()
        assert n_parts < n_parts_u == 6
    finally:
        idx_c.drop()
        idx_u.drop()
        spark.sql("DROP TABLE IF EXISTS tcmp_fold_splits")
        spark.sql("DROP TABLE IF EXISTS tcmp_plain_splits")
        spark.catalog.clearCache()

"""Incremental near-dup detection must find exactly the pairs the
batch MinHash pipeline finds on the full corpus, regardless of how
documents are split across arrival batches."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from datasette_upload_csvs_spark.operators import dedup
from datasette_upload_csvs_spark.sources.parquet import read_table
from datasette_upload_csvs_spark.streaming.near_dup_stream import (
    maintain_near_dup_stream,
)


def test_stream_near_dup_equals_batch(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs_stream")
    os.makedirs(src)
    for i in range(3):
        part = docs.filter(F.pmod("doc_id", F.lit(3)) == i)
        d = str(tmp_path / f"p{i}")
        part.coalesce(1).write.mode("overwrite").parquet(d)
        name = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(d, name), os.path.join(src, f"arrival_{i}.parquet"))

    for t in ("nd_pairs", "nd_index", "nd_index__sets"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    n = maintain_near_dup_stream(
        spark, src, "doc_id bigint, text string",
        pairs_table="nd_pairs", index_table="nd_index", threshold=0.7,
    )
    assert n == 3

    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 10))
        for r in spark.table("nd_pairs").collect()
    }
    want = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 10))
        for r in dedup.minhash_near_dup_pairs(docs, threshold=0.7).collect()
    }
    assert got == want and got  # same pairs, no dupes, none missed
    # no pair is ever emitted twice across batches
    assert spark.table("nd_pairs").count() == len(got)
    for t in ("nd_pairs", "nd_index", "nd_index__sets"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_stream_near_dup_restart_from_checkpoint(spark, sf_dir, tmp_path):
    """Kill-and-restart recovery: drain 2 arrival files, stop (the
    availableNow query terminates — the 'kill'), land 2 more files,
    restart with the SAME checkpoint. The restarted run must process
    ONLY the new files (no index double-append), and the final
    pairs/index must equal a batch rebuild over the full corpus."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs_stream_ckpt")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def land(i):
        part = docs.filter(F.pmod("doc_id", F.lit(4)) == i)
        d = str(tmp_path / f"cp{i}")
        part.coalesce(1).write.mode("overwrite").parquet(d)
        name = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(d, name), os.path.join(src, f"arrival_{i}.parquet"))

    for t in ("ndr_pairs", "ndr_index", "ndr_index__sets"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")

    land(0); land(1)
    n1 = maintain_near_dup_stream(
        spark, src, "doc_id bigint, text string",
        pairs_table="ndr_pairs", index_table="ndr_index", threshold=0.7,
        checkpoint_dir=ckpt,
    )
    assert n1 == 2
    idx_after_first = spark.table("ndr_index").count()

    land(2); land(3)
    n2 = maintain_near_dup_stream(
        spark, src, "doc_id bigint, text string",
        pairs_table="ndr_pairs", index_table="ndr_index", threshold=0.7,
        checkpoint_dir=ckpt,
    )
    # restart processed ONLY the two new files
    assert n2 == 2

    # the index extended (new docs) but never re-appended old bands:
    # per-doc band rows appear exactly once
    spark.catalog.refreshTable("ndr_index")
    idx = spark.table("ndr_index")
    assert idx.count() > idx_after_first
    assert (
        idx.groupBy("doc_id", "band").count().filter(F.col("count") > 1).count()
        == 0
    )

    # stream result == batch rebuild over the full corpus
    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 10))
        for r in spark.table("ndr_pairs").collect()
    }
    want = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 10))
        for r in dedup.minhash_near_dup_pairs(docs, threshold=0.7).collect()
    }
    assert got == want and got
    assert spark.table("ndr_pairs").count() == len(got)
    for t in ("ndr_pairs", "ndr_index", "ndr_index__sets"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_near_dup_epoch_mid_batch_replay_idempotent(spark, sf_dir):
    """Replaying a fully-written epoch must leave pairs, bands, and
    sets tables bit-identical (epoch-masked reads + per-epoch dynamic
    partition overwrite), and the contents must equal the batch
    MinHash pipeline — the same exactly-once contract the ANN /
    split / curation streams prove for their stores."""
    from datasette_upload_csvs_spark.streaming.near_dup_stream import (
        near_dup_epoch,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    b0 = docs.filter(F.pmod("doc_id", F.lit(2)) == 0)
    b1 = docs.filter(F.pmod("doc_id", F.lit(2)) == 1)
    tables = ("ndx_pairs", "ndx_index", "ndx_index__sets")
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")

    near_dup_epoch(b0, 0, "ndx_pairs", "ndx_index", threshold=0.7)
    near_dup_epoch(b1, 1, "ndx_pairs", "ndx_index", threshold=0.7)

    def snap(t):
        spark.catalog.refreshTable(t)
        return sorted(
            tuple(
                tuple(v) if isinstance(v, list) else v for v in r
            )
            for r in spark.table(t).collect()
        )

    before = {t: snap(t) for t in tables}
    # the replay: epoch 1 re-delivered after ALL its writes landed
    near_dup_epoch(b1, 1, "ndx_pairs", "ndx_index", threshold=0.7)
    after = {t: snap(t) for t in tables}
    assert after == before  # no double-append anywhere

    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in spark.table("ndx_pairs").collect()
    }
    want = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in dedup.minhash_near_dup_pairs(docs, threshold=0.7).collect()
    }
    assert got == want and got
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_near_dup_epoch_reports_candidate_mass(spark):
    """near_dup_epoch returns {"cand_pairs": n} — the distinct
    candidate count the epoch generated (rides the pairs write via
    Observation, no extra job). On a sub-threshold template family
    verified pairs are 0 while candidates are not; with
    bucket_star_cap engaged the reported candidates must shrink,
    which is exactly the quantity BENCH_FUNNEL_STREAM attributes."""
    from datasette_upload_csvs_spark.streaming.near_dup_stream import (
        near_dup_epoch,
    )

    stop = "the and for with that this from "
    tmpl = " ".join(f"tmpl{j}" for j in range(30))
    fam = [
        (i, stop + tmpl + " " + " ".join(f"u{j}x{i}" for j in range(12)))
        for i in range(40)
    ]
    batch = spark.createDataFrame(fam, "doc_id long, text string")

    def run(cap, suffix):
        tables = (f"ndc_pairs_{suffix}", f"ndc_index_{suffix}",
                  f"ndc_index_{suffix}__sets")
        for t in tables:
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        try:
            stats = near_dup_epoch(
                batch, 0, tables[0], tables[1],
                threshold=0.7, bucket_star_cap=cap,
            )
            spark.catalog.refreshTable(tables[0])
            verified = spark.table(tables[0]).count()
            return stats["cand_pairs"], verified
        finally:
            for t in tables:
                spark.sql(f"DROP TABLE IF EXISTS {t}")

    cand_uncapped, ver_uncapped = run(None, "u")
    cand_capped, ver_capped = run(4, "c")
    # the family band-collides: at shingle-Jaccard ~0.59 a pair
    # collides in >=1 of 32 bands w.p. ~0.99, so uncapped candidates
    # sit just under all-pairs (deterministic hashes — stable count)
    assert 40 * 39 // 2 * 0.8 <= cand_uncapped <= 40 * 39 // 2
    # sub-threshold: nothing verifies, on either path
    assert ver_uncapped == 0 and ver_capped == 0
    # the cap collapses the joined-against side to anchors
    assert 0 < cand_capped < cand_uncapped

    # empty batch: no stats, no tables touched
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert near_dup_epoch(empty, 0, "ndc_pairs_e", "ndc_index_e") is None
    assert not spark.catalog.tableExists("ndc_pairs_e")

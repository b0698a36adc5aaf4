"""Incremental embedding near-neighbor detection must find exactly
the pairs the banded batch run finds on the full corpus snapshot,
regardless of how vectors are split across arrival batches."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from datasette_upload_csvs_spark.streaming.ann_stream import (
    embedding_ann_batch,
    maintain_embedding_ann_stream,
)


def _corpus_with_near_dups(spark, sf_dir):
    """Base embeddings plus a perturbed copy of every 5th vector —
    guaranteed cos ≈ 0.9999 near-neighbor pairs across batches."""
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = base.count()
    dups = (
        base.filter(F.pmod("vec_id", F.lit(5)) == 0)
        .select(
            (F.col("vec_id") + n).alias("vec_id"),
            F.transform(
                "embedding", lambda x, i: x + F.when(i == 0, 0.001).otherwise(0.0)
            ).cast("array<float>").alias("embedding"),
        )
    )
    return base.unionByName(dups)


def test_stream_ann_equals_batch(spark, sf_dir, tmp_path):
    corpus = _corpus_with_near_dups(spark, sf_dir)
    src = str(tmp_path / "emb_stream")
    os.makedirs(src)
    for i in range(3):
        part = corpus.filter(F.pmod("vec_id", F.lit(3)) == i)
        d = str(tmp_path / f"e{i}")
        part.coalesce(1).write.mode("overwrite").parquet(d)
        name = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        shutil.copy(
            os.path.join(d, name), os.path.join(src, f"arrival_{i}.parquet")
        )

    for t in ("ann_pairs", "ann_index", "ann_index__vecs"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    n = maintain_embedding_ann_stream(
        spark,
        src,
        "vec_id bigint, embedding array<float>",
        pairs_table="ann_pairs",
        index_table="ann_index",
        threshold=0.99,
    )
    assert n == 3

    got = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in spark.table("ann_pairs").collect()
    }
    want = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in embedding_ann_batch(corpus, threshold=0.99).collect()
    }
    assert got == want and got  # same pairs, none missed, none invented
    # the construction's planted pairs are all found (cos ≈ 0.9999
    # twins collide in at least one of the 4 tables)
    n_base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    planted = {
        r["vec_id"]
        for r in corpus.filter(F.col("vec_id") >= n_base).collect()
    }
    found_ids = {b for _, b, _ in got}
    assert planted <= found_ids
    # no pair emitted twice across batches
    assert spark.table("ann_pairs").count() == len(got)
    # vector store holds each vector once
    vc = spark.table("ann_index__vecs")
    assert vc.count() == vc.select("vec_id").distinct().count() == corpus.count()
    for t in ("ann_pairs", "ann_index", "ann_index__vecs"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bands_arrow_matches_expression(spark, sf_dir):
    from datasette_upload_csvs_spark.streaming.ann_stream import (
        _multi_table_bands,
        multi_table_bands_arrow,
    )

    corpus = _corpus_with_near_dups(spark, sf_dir)
    expr = {
        (r["vec_id"], r["table_id"], r["bucket"])
        for r in _multi_table_bands(corpus, 4, 8, 64).collect()
    }
    arrow = {
        (r["vec_id"], r["table_id"], r["bucket"])
        for r in multi_table_bands_arrow(corpus, 4, 8, 64).collect()
    }
    assert expr == arrow and len(expr) == corpus.count() * 4


def test_ann_epoch_mid_batch_replay_idempotent(spark, sf_dir):
    """at-least-once redelivery: offsets commit AFTER the sink, so a
    kill mid-batch re-delivers an epoch whose writes (some or all)
    already landed. Replaying a fully-written epoch must leave all
    THREE tables bit-identical (epoch-masked reads + per-epoch
    dynamic partition overwrite), and the final contents must equal
    the one-shot batch run — the same exactly-once contract
    split_stream/curation_stream prove for their stores."""
    from datasette_upload_csvs_spark.streaming.ann_stream import ann_epoch

    corpus = _corpus_with_near_dups(spark, sf_dir)
    b0 = corpus.filter(F.pmod("vec_id", F.lit(2)) == 0)
    b1 = corpus.filter(F.pmod("vec_id", F.lit(2)) == 1)
    tables = ("annx_pairs", "annx_index", "annx_index__vecs")
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")

    ann_epoch(b0, 0, "annx_pairs", "annx_index", threshold=0.99)
    ann_epoch(b1, 1, "annx_pairs", "annx_index", threshold=0.99)

    def snap(t):
        spark.catalog.refreshTable(t)
        return sorted(tuple(r) for r in spark.table(t).collect())

    before = {t: snap(t) for t in tables}

    # the replay: epoch 1 re-delivered after ALL its writes landed
    ann_epoch(b1, 1, "annx_pairs", "annx_index", threshold=0.99)
    after = {t: snap(t) for t in tables}
    assert after == before  # no double-append anywhere

    got = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in spark.table("annx_pairs").collect()
    }
    want = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in embedding_ann_batch(corpus, threshold=0.99).collect()
    }
    assert got == want and got
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_stream_ann_restart_from_checkpoint(spark, sf_dir, tmp_path):
    """Kill-and-restart recovery: drain 2 arrival files, stop, land
    2 more, restart with the SAME checkpoint. The restart must
    process ONLY the new files (no band double-append) and the final
    pairs must equal the batch run over the full corpus."""
    corpus = _corpus_with_near_dups(spark, sf_dir)
    src = str(tmp_path / "emb_stream_ckpt")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def land(i):
        part = corpus.filter(F.pmod("vec_id", F.lit(4)) == i)
        d = str(tmp_path / f"ec{i}")
        part.coalesce(1).write.mode("overwrite").parquet(d)
        name = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        shutil.copy(
            os.path.join(d, name), os.path.join(src, f"arrival_{i}.parquet")
        )

    for t in ("annr_pairs", "annr_index", "annr_index__vecs"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")

    args = dict(
        pairs_table="annr_pairs",
        index_table="annr_index",
        threshold=0.99,
        checkpoint_dir=ckpt,
    )
    land(0); land(1)
    n1 = maintain_embedding_ann_stream(
        spark, src, "vec_id bigint, embedding array<float>", **args
    )
    assert n1 == 2
    idx_after_first = spark.table("annr_index").count()

    land(2); land(3)
    n2 = maintain_embedding_ann_stream(
        spark, src, "vec_id bigint, embedding array<float>", **args
    )
    assert n2 == 2  # restart processed ONLY the new files

    spark.catalog.refreshTable("annr_index")
    idx = spark.table("annr_index")
    assert idx.count() > idx_after_first
    # per-vector band rows appear exactly once per table_id
    assert (
        idx.groupBy("vec_id", "table_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
        == 0
    )

    got = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in spark.table("annr_pairs").collect()
    }
    want = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in embedding_ann_batch(corpus, threshold=0.99).collect()
    }
    assert got == want and got
    assert spark.table("annr_pairs").count() == len(got)
    for t in ("annr_pairs", "annr_index", "annr_index__vecs"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_ann_gate_fold(spark, sf_dir):
    # r15: ann_bands_recall folds its planted-count pass and the
    # collapse gate's dup-mass statistic into ONE base aggregate
    # (queries._ann_recall_stats) and hands embedding_ann_batch the
    # precomputed (nd, ng). Pin the folded statistic bit-equal to
    # dedup._dup_mass_stats on the corpus the gate actually sees —
    # on the clean fixture AND on a dup-heavy corpus (identical
    # vectors) whose statistic would trip the gate — so the regime
    # decision is provably unchanged.
    from datasette_upload_csvs_spark.functions.vector import (
        double_array_frame,
    )
    from datasette_upload_csvs_spark.operators import dedup
    from datasette_upload_csvs_spark.queries import _ann_recall_stats

    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    heavy = base.unionByName(
        base.filter(F.pmod("vec_id", F.lit(2)) == 0).select(
            (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"),
            "embedding",
        )
    )
    for b in (base, heavy):
        st = _ann_recall_stats(b)
        off = int(st["mx"]) + 1
        twins = b.filter(F.pmod("vec_id", F.lit(5)) == 0).select(
            (F.col("vec_id") + off).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x
                + F.when(i == 0, F.lit(0.001)).otherwise(F.lit(0.0)),
            ).cast("array<float>").alias("embedding"),
        )
        corpus = b.unionByName(twins)
        nd, ng = dedup._dup_mass_stats(
            double_array_frame(corpus), F.xxhash64("v")
        )
        assert (int(st["n"]) + int(st["p"]), int(st["ngc"])) == (nd, ng)
    # the dup-heavy corpus must actually reach gate-tripping mass
    # (duplicate rows >= 1% of corpus), or the second leg pins nothing
    st = _ann_recall_stats(heavy)
    ndh = int(st["n"]) + int(st["p"])
    assert ndh - int(st["ngc"]) > 0.01 * ndh
    spark.catalog.clearCache()

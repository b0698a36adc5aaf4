"""State-table compaction (round-8 VERDICT item 7): `_batch_id`-
partitioned exactly-once tables grow one partition per epoch forever;
compact_state_table folds closed epochs into the BASE partition.

Pins: (1) a 120-epoch stream keeps a BOUNDED partition count under
periodic compaction with CONTENT IDENTICAL to the uncompacted run;
(2) the replay mask is still correct after compaction (re-delivering
an epoch neither double-writes nor sees its own rows as history);
(3) a crash at ANY step of the fold is repaired by re-running
compaction with the same watermark; (4) a lingering staging partition
from a crashed fold is invisible to read_state.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datasette_upload_csvs_spark.streaming import epoch_write
from datasette_upload_csvs_spark.streaming.epoch_write import (
    BASE_EPOCH,
    _staging_id,
    compact_state_table,
    read_state,
    write_epoch_partition,
)


def _epoch_rows(spark, epoch, n=3):
    return spark.range(n).select(
        (F.col("id") + epoch * 1000).alias("val"),
        F.lit(epoch).cast("long").alias("_batch_id"),
    )


def _partitions(spark, table):
    return sorted(
        r["_batch_id"]
        for r in spark.table(table).select("_batch_id").distinct().collect()
    )


def _values(spark, table):
    return sorted(r["val"] for r in spark.table(table).collect())


@pytest.fixture()
def clean(spark):
    for t in ("t_long", "t_replay", "t_crash", "t_guard"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    yield
    for t in ("t_long", "t_replay", "t_crash", "t_guard"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_long_stream_bounded_partitions(spark, clean):
    # 120 epochs, compacting every 20: partition count stays bounded
    # (base + at most compact_every open epochs), content identical
    # to never compacting
    expect = []
    for e in range(120):
        write_epoch_partition(_epoch_rows(spark, e), "t_long")
        expect.extend(e * 1000 + i for i in range(3))
        if e > 0 and e % 20 == 0:
            folded = compact_state_table(spark, "t_long", before_epoch=e)
            assert folded > 0
        assert len(_partitions(spark, "t_long")) <= 22  # base + <=21 open
    parts = _partitions(spark, "t_long")
    assert parts[0] == BASE_EPOCH
    assert len(parts) == 1 + 20  # base + open epochs 100..119
    assert _values(spark, "t_long") == sorted(expect)


def test_replay_mask_correct_after_compaction(spark, clean):
    # epochs 0..9, compact [0,9), then REPLAY epoch 9 (at-least-once
    # redelivery): history read masks epoch 9's own partition, sees
    # everything older exactly once (now inside base), and the
    # rewrite does not double-append
    for e in range(10):
        write_epoch_partition(_epoch_rows(spark, e), "t_replay")
    compact_state_table(spark, "t_replay", before_epoch=9)
    assert _partitions(spark, "t_replay") == [BASE_EPOCH, 9]
    hist = read_state(spark, "t_replay", 9)
    assert sorted(r["val"] for r in hist.collect()) == sorted(
        e * 1000 + i for e in range(9) for i in range(3)
    )
    write_epoch_partition(_epoch_rows(spark, 9), "t_replay")  # the replay
    assert _values(spark, "t_replay") == sorted(
        e * 1000 + i for e in range(10) for i in range(3)
    )


def test_crash_repair_at_every_step(spark, clean, monkeypatch):
    # drive the fold to crash after each step, then re-run with the
    # same watermark: final content and partitions must equal the
    # crash-free fold's
    for crash_after in (1, 2, 3):
        spark.sql("DROP TABLE IF EXISTS t_crash")
        for e in range(6):
            write_epoch_partition(_epoch_rows(spark, e), "t_crash")

        calls = {"writes": 0, "drops": 0}
        real_write = epoch_write.write_epoch_partition
        real_drop = epoch_write._drop_partitions

        def wr(out, table, part_col="_batch_id", **kw):
            real_write(out, table, part_col, **kw)
            calls["writes"] += 1
            if crash_after == 1 and calls["writes"] == 1:
                raise RuntimeError("crash after stage")
            if crash_after == 2 and calls["writes"] == 2:
                raise RuntimeError("crash after promote")

        def dr(sp, table, ids, part_col="_batch_id"):
            real_drop(sp, table, ids, part_col)
            calls["drops"] += 1
            if crash_after == 3 and calls["drops"] == 1:
                raise RuntimeError("crash after epoch drop")

        monkeypatch.setattr(epoch_write, "write_epoch_partition", wr)
        monkeypatch.setattr(epoch_write, "_drop_partitions", dr)
        with pytest.raises(RuntimeError):
            compact_state_table(spark, "t_crash", before_epoch=5)
        monkeypatch.setattr(epoch_write, "write_epoch_partition", real_write)
        monkeypatch.setattr(epoch_write, "_drop_partitions", real_drop)

        compact_state_table(spark, "t_crash", before_epoch=5)  # repair
        assert _partitions(spark, "t_crash") == [BASE_EPOCH, 5], crash_after
        assert _values(spark, "t_crash") == sorted(
            e * 1000 + i for e in range(6) for i in range(3)
        ), crash_after


def test_read_state_masks_lingering_staging(spark, clean):
    # a staging partition left by a crashed fold duplicates history;
    # read_state must not see it (nor the open epoch's own partition)
    for e in range(4):
        write_epoch_partition(_epoch_rows(spark, e), "t_guard")
    staged = (
        spark.table("t_guard")
        .filter(F.col("_batch_id") < 3)
        .withColumn("_batch_id", F.lit(_staging_id(3)))
        .localCheckpoint()
    )
    write_epoch_partition(staged, "t_guard")  # simulated crash residue
    hist = read_state(spark, "t_guard", 3)
    assert sorted(r["val"] for r in hist.collect()) == sorted(
        e * 1000 + i for e in range(3) for i in range(3)
    )


def test_ann_stream_with_compaction_equals_batch(spark, sf_dir, tmp_path):
    # the wired-in form: maintain_embedding_ann_stream(compact_every=2)
    # over 6 arrival files — pairs identical to the one-shot batch run,
    # partition count bounded by base + epochs-since-last-fold
    import os
    import shutil

    from datasette_upload_csvs_spark.streaming.ann_stream import (
        embedding_ann_batch,
        maintain_embedding_ann_stream,
    )

    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    src = str(tmp_path / "emb_stream_c")
    os.makedirs(src)
    for i in range(6):
        part = corpus.filter(F.pmod("vec_id", F.lit(6)) == i)
        d = str(tmp_path / f"ec{i}")
        part.coalesce(1).write.mode("overwrite").parquet(d)
        name = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        shutil.copy(
            os.path.join(d, name), os.path.join(src, f"arrival_{i}.parquet")
        )
    for t in ("annc_pairs", "annc_index", "annc_index__vecs"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    n = maintain_embedding_ann_stream(
        spark,
        src,
        "vec_id bigint, embedding array<float>",
        pairs_table="annc_pairs",
        index_table="annc_index",
        threshold=0.99,
        compact_every=2,
    )
    assert n == 6
    got = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in spark.table("annc_pairs").collect()
    }
    want = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in embedding_ann_batch(corpus, threshold=0.99).collect()
    }
    assert got == want
    for t in ("annc_index", "annc_index__vecs"):
        parts = _partitions(spark, t)
        assert len(parts) <= 3, (t, parts)  # base + epochs since fold
        assert parts[0] == BASE_EPOCH
    # the folded index is intact: each vector stored exactly once
    vc = spark.table("annc_index__vecs")
    assert vc.count() == vc.select("vec_id").distinct().count() == corpus.count()
    for t in ("annc_pairs", "annc_index", "annc_index__vecs"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")

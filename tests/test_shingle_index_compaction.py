"""ShingleIndex.compact (round-9 VERDICT item 6): the epoch fold
(epoch_write.compact_state_table, part_col="batch") extended to the
maintained shingle index, so its per-batch parquet appends stop
accreting one file-set per batch forever. Pins: bounded partition AND
file counts over 100+ appends, append-stability (edge queries equal a
never-compacted twin and the one-shot capped path), orphan handling,
and crash-repair at the step boundaries the fold adds here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datasette_upload_csvs_spark.operators import dedup
from datasette_upload_csvs_spark.operators.shingle_index import ShingleIndex


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _mk_batch(b: int):
    """Two docs per batch; every 4th batch near-dups the boilerplate
    family so folds carry real cross-batch edges."""
    base = " ".join(f"c{i}" for i in range(40))
    if b % 4 == 0:
        return [(100 * b, base + f" x{b}"), (100 * b + 1, " ".join(f"u{b}v{j}" for j in range(12)))]
    return [
        (100 * b, " ".join(f"q{b}w{j}" for j in range(12))),
        (100 * b + 1, " ".join(f"r{b}s{j}" for j in range(12))),
    ]


def _edges(idx, docs, **kw):
    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in idx.edges_for_batch(docs, threshold=0.7, max_df=20, **kw).collect()
    }
    idx.spark.catalog.clearCache()
    return got


def _partition_and_file_counts(spark, table):
    rows = spark.sql(f"SHOW PARTITIONS {table}").collect()
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {table}")
        .filter(F.col("col_name") == "Location")
        .first()["data_type"]
    )
    import os

    path = loc.replace("file:", "")
    n_files = sum(
        1
        for root, _, files in os.walk(path)
        for f in files
        if not f.startswith((".", "_"))
    )
    return len(rows), n_files


def test_bounded_over_100_batches_append_stable(spark):
    """100 appends with compact every 10: partition/file counts stay
    bounded, and edge queries remain identical to a NEVER-compacted
    twin index fed the same appends."""
    idx = ShingleIndex(spark, "tcix")
    ref = ShingleIndex(spark, "tcix_ref")
    idx.drop()
    ref.drop()
    try:
        checked = 0
        for b in range(100):
            batch = _docs(spark, _mk_batch(b))
            if b % 25 == 24:  # spot-check edge equality pre-append
                got = _edges(idx, batch)
                want = _edges(ref, batch)
                assert got == want, b
                checked += 1
            idx.append(batch, batch=b)
            ref.append(batch, batch=b)
            if b % 10 == 9:
                idx.compact(before_batch=b)  # b itself stays unfolded
        assert checked == 4

        for t in (idx.postings, idx.sets, idx.df_tab, idx.commits):
            n_parts, n_files = _partition_and_file_counts(spark, t)
            # base + at most one fold window of live batches + the
            # open batch — nowhere near the 100 an uncompacted index
            # accretes
            assert n_parts <= 13, (t, n_parts)
            assert n_files <= 60, (t, n_files)
        n_parts_ref, _ = _partition_and_file_counts(spark, ref.postings)
        assert n_parts_ref == 100  # what unbounded accretion looks like

        # post-fold query over the full grown corpus still matches
        probe = _docs(spark, _mk_batch(100))
        assert _edges(idx, probe) == _edges(ref, probe)
    finally:
        idx.drop()
        ref.drop()
        spark.catalog.clearCache()


def test_orphan_partitions_dropped_not_folded(spark):
    """A crashed append (data partitions written, no commit marker)
    below the watermark is dropped by compact — its rows must never
    surface through the unconditionally-read base partition."""
    idx = ShingleIndex(spark, "tcix_orph")
    idx.drop()
    try:
        for b in range(3):
            idx.append(_docs(spark, _mk_batch(b)), batch=b)
        # simulate the crash: batch 3 data lands, marker does not
        orphan = _docs(spark, [(999, " ".join(f"z9z{j}" for j in range(12)))])
        sets = idx._batch_sets(orphan, "text", "doc_id")
        idx._write_partition(
            sets.withColumn("batch", F.lit(3).cast("bigint")), idx.sets
        )
        before = _edges(idx, _docs(spark, _mk_batch(7)))
        idx.compact(before_batch=4)
        # orphan partition is gone from disk, not promoted into base
        ids = {
            r["doc_id"] for r in spark.table(idx.sets).select("doc_id").collect()
        }
        assert 999 not in ids
        assert _edges(idx, _docs(spark, _mk_batch(7))) == before
    finally:
        idx.drop()
        spark.catalog.clearCache()


def test_partial_fold_states_read_correct_and_rerun_repairs(spark):
    """Crash boundaries the index adds on top of the (already
    crash-tested) state-table fold: after SOME data tables folded but
    not others, and before the marker fold — reads must be correct at
    each quiesced state, and re-running compact converges."""
    from datasette_upload_csvs_spark.streaming.epoch_write import (
        compact_state_table,
    )

    idx = ShingleIndex(spark, "tcix_crash")
    idx.drop()
    try:
        for b in range(4):
            idx.append(_docs(spark, _mk_batch(b)), batch=b)
        probe = _docs(spark, _mk_batch(9))
        want = _edges(idx, probe)

        # crash state A: only postings folded (sets/df/markers not)
        compact_state_table(
            spark, idx.postings, before_batch := 3, part_col="batch",
            sort_cols=["shingle"],
        )
        assert _edges(idx, probe) == want

        # crash state B: postings + sets folded
        compact_state_table(spark, idx.sets, before_batch, part_col="batch")
        assert _edges(idx, probe) == want

        # repair: full compact with the same watermark converges
        idx.compact(before_batch=before_batch)
        assert _edges(idx, probe) == want
        # markers folded but committed-ness preserved via payload ids
        live_parts = {
            r["batch"]
            for r in spark.sql(f"SHOW PARTITIONS {idx.commits}")
            .selectExpr("cast(split(partition, '=')[1] as bigint) as batch")
            .collect()
        }
        assert live_parts == {-1, 3}
        committed = {
            r["b"] for r in spark.table(idx.commits).select("b").collect()
        }
        assert committed == {0, 1, 2, 3}

        # idempotent re-run (post-crash convention): nothing changes
        idx.compact(before_batch=before_batch)
        assert _edges(idx, probe) == want

        # appends keep working after the fold
        idx.append(_docs(spark, _mk_batch(9)), batch=9)
        got = _edges(idx, _docs(spark, _mk_batch(10)))
        ref = ShingleIndex(spark, "tcix_crash_ref")
        ref.drop()
        try:
            for b in list(range(4)) + [9]:
                ref.append(_docs(spark, _mk_batch(b)), batch=b)
            assert got == _edges(ref, _docs(spark, _mk_batch(10)))
        finally:
            ref.drop()
    finally:
        idx.drop()
        spark.catalog.clearCache()


def test_minor_index_fold_window_only_and_gate_exact(spark):
    """since_batch > 0: the generational index fold — window batches
    fold into a RUN partition whose id is the window's highest
    COMMITTED batch (so the marker gate stays exact), history is
    untouched, an uncommitted orphan in the window is dropped not
    promoted, and a later major fold absorbs the runs."""
    idx = ShingleIndex(spark, "tcix_minor")
    idx.drop()
    try:
        for b in range(4):
            idx.append(_docs(spark, _mk_batch(b)), batch=b)
        idx.compact(before_batch=4)  # history -> base
        for b in range(4, 8):
            if b == 7:  # crashed append: data, no marker
                sets = idx._batch_sets(
                    _docs(spark, [(777, " ".join(f"o7o{j}" for j in range(12)))]),
                    "text", "doc_id",
                )
                idx._write_partition(
                    sets.withColumn("batch", F.lit(7).cast("bigint")), idx.sets
                )
            else:
                idx.append(_docs(spark, _mk_batch(b)), batch=b)
        probe = _docs(spark, _mk_batch(20))
        want = _edges(idx, probe)

        n = idx.compact(before_batch=8, since_batch=4)
        assert n >= 2
        # run id = highest committed in window (6, since 7 is orphan)
        parts = {
            r["batch"]
            for r in spark.sql(f"SHOW PARTITIONS {idx.sets}")
            .selectExpr("cast(split(partition, '=')[1] as bigint) as batch")
            .collect()
        }
        assert parts == {-1, 6}
        assert 777 not in {
            r["doc_id"] for r in spark.table(idx.sets).select("doc_id").collect()
        }
        assert _edges(idx, probe) == want
        # committed-ness preserved: markers for 4,5,6 live in run 6
        committed = {
            r["b"] for r in spark.table(idx.commits).select("b").collect()
        }
        assert committed == {0, 1, 2, 3, 4, 5, 6}

        # appends continue; a later MAJOR fold absorbs the run
        idx.append(_docs(spark, _mk_batch(8)), batch=8)
        idx.compact(before_batch=9)
        parts = {
            r["batch"]
            for r in spark.sql(f"SHOW PARTITIONS {idx.sets}")
            .selectExpr("cast(split(partition, '=')[1] as bigint) as batch")
            .collect()
        }
        assert parts == {-1}
        ref = ShingleIndex(spark, "tcix_minor_ref")
        ref.drop()
        try:
            for b in list(range(7)) + [8]:
                ref.append(_docs(spark, _mk_batch(b)), batch=b)
            assert _edges(idx, probe) == _edges(ref, probe)
        finally:
            ref.drop()
    finally:
        idx.drop()
        spark.catalog.clearCache()

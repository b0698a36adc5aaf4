"""Streaming-surface tests: windowed aggregation parity between the
streaming and batch plans (memory sink, availableNow), and streaming
CSV ingest with per-batch progress.

These are the driver's 'weaker rows-only' class — live streaming
state isn't SQL-expressible — but we pin them against the *batch*
twins, which ARE oracle-checked, so the chain is closed:
stream result == batch result == DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from datasette_upload_csvs_spark import queries as Q
from datasette_upload_csvs_spark import streaming as S


def _run_stream_to_memory(spark, sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def _events_stream(spark, sf_dir, tmp_path):
    # re-shard the batch events table into files and readStream them —
    # a real file-source stream with the same rows.
    src = os.path.join(tmp_path, "events_stream_src")
    Q.load(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(src)
    schema = spark.read.parquet(src).schema
    return spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 2
    ).parquet(src)


def test_tumbling_stream_matches_batch(spark, sf_dir, tmp_path):
    stream = _events_stream(spark, sf_dir, str(tmp_path))
    out = _run_stream_to_memory(
        spark, S.tumbling_counts_stream(stream), "tumbling_out"
    )
    got = {
        (r["bucket_start"], r["event_type"], r["n_events"])
        for r in out.collect()
    }
    batch = Q.queries()["events_tumbling_window"](spark, sf_dir)
    want = {
        (r["bucket_start"], r["event_type"], r["n_events"])
        for r in batch.collect()
    }
    assert got == want


def test_session_stream_matches_batch(spark, sf_dir, tmp_path):
    stream = _events_stream(spark, sf_dir, str(tmp_path))
    out = _run_stream_to_memory(
        spark, S.session_counts_stream(stream), "session_out"
    )
    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in out.collect()
    }
    batch = Q.queries()["events_session_window"](spark, sf_dir)
    want = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in batch.collect()
    }
    assert got == want


def test_watermark_is_applied(spark, sf_dir, tmp_path):
    stream = _events_stream(spark, sf_dir, str(tmp_path))
    sdf = S.tumbling_counts_stream(stream, watermark="30 minutes")
    assert sdf.isStreaming
    # watermark node present in the logical plan
    assert "EventTimeWatermark" in sdf._jdf.queryExecution().logical().toString()


def test_stream_csv_ingest_progress(spark, tmp_path):
    src = os.path.join(str(tmp_path), "csvs")
    os.makedirs(src)
    for i in range(3):
        with open(os.path.join(src, f"part{i}.csv"), "w") as f:
            f.write("name,age\n")
            for j in range(10):
                f.write(f"row{i}_{j},{i * 10 + j}\n")
    res = S.stream_csv_to_table(spark, src, table=f"stream_tbl_{os.getpid()}")
    assert res["rows"] == 30
    assert res["batches"] >= 2  # maxFilesPerTrigger=1 → one batch per file
    from datasette_upload_csvs_spark import ingest

    prog = ingest.get_progress(spark, res["task_id"])
    assert prog["bytes_done"] == prog["bytes_todo"]
    assert prog["rows_done"] == 30
    assert spark.table(res["table"]).count() == 30


def test_stateful_running_totals(spark, sf_dir, tmp_path):
    """applyInPandasWithState: final per-user totals must equal the
    batch groupBy (every user's last update row carries the full
    running total once the stream drains)."""
    from datasette_upload_csvs_spark.streaming import stateful

    stream = _events_stream(spark, sf_dir, str(tmp_path))
    sdf = stateful.running_user_totals(stream)
    q = (
        sdf.writeStream.format("memory")
        .queryName("stateful_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("stateful_out").toPandas()
    # last update per user = totals after the final batch
    last = out.groupby("user_id").last()
    batch = (
        Q.load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .toPandas()
        .set_index("user_id")
    )
    assert len(last) == len(batch)
    for uid, row in batch.iterrows():
        assert last.loc[uid, "n_events"] == row["n"]
        assert abs(last.loc[uid, "sum_value"] - row["s"]) < 1e-6


def test_streaming_dedup_exactly_once(spark, sf_dir, tmp_path):
    """Feed every event twice; the deduped stream must emit each
    event_id exactly once (matching the batch distinct count)."""
    import os

    from datasette_upload_csvs_spark.streaming.dedup_stream import (
        dedup_events_stream,
    )

    src = os.path.join(str(tmp_path), "dup_events_src")
    ev = Q.load(spark, sf_dir, "events")
    ev.write.mode("overwrite").parquet(src)
    ev.write.mode("append").parquet(src)  # duplicate delivery
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 2
    ).parquet(src)
    sdf = dedup_events_stream(stream)
    q = (
        sdf.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("dedup_out")
    n_distinct_in = ev.select("event_id").distinct().count()
    assert out.count() == n_distinct_in
    assert out.select("event_id").distinct().count() == n_distinct_in


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    """Streaming click→purchase attribution must equal the identical
    batch join over the same rows."""
    from datasette_upload_csvs_spark.streaming.joins import clicks_to_purchases

    stream = _events_stream(spark, sf_dir, str(tmp_path))
    clicks_s = stream.filter(F.col("event_type") == "click")
    purch_s = stream.filter(F.col("event_type") == "purchase")
    sdf = clicks_to_purchases(clicks_s, purch_s)
    q = (
        sdf.writeStream.format("memory")
        .queryName("attr_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.table("attr_out").collect()
    }

    ev = Q.load(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts"),
        F.col("event_id").alias("cid"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts"),
        F.col("event_id").alias("pid"),
    )
    want = {
        (r["cid"], r["pid"])
        for r in c.join(
            p,
            (F.col("cu") == F.col("pu"))
            & (F.col("pts") >= F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 30 MINUTES")),
        ).collect()
    }
    assert got == want
    assert len(got) > 0


def test_stream_stream_left_outer_join_emits_unmatched(spark, tmp_path):
    """Left-outer stream-stream join: matched clicks join live;
    unmatched clicks emit with NULL purchase columns once the
    watermark proves no purchase can still arrive."""
    import os

    from datasette_upload_csvs_spark.streaming.joins import (
        clicks_to_purchases_outer,
    )

    cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purch")
    os.makedirs(cdir); os.makedirs(pdir)
    schema = "user_id long, ts timestamp, event_id long, value double"

    def w(d, name, rows):
        df = spark.createDataFrame(
            rows, "user_id long, ts string, event_id long, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "tmpw"))
        part = [f for f in os.listdir(tmp_path / "tmpw") if f.endswith(".parquet")][0]
        os.rename(str(tmp_path / "tmpw" / part), os.path.join(d, name))

    # batch 0: one matchable click (u1), one unmatchable (u2)
    w(cdir, "c0.parquet", [(1, "2024-01-01 10:00:00", 101, 0.0),
                           (2, "2024-01-01 10:00:00", 102, 0.0)])
    w(pdir, "p0.parquet", [(1, "2024-01-01 10:10:00", 201, 9.0)])
    # batch 1: far-future pair advances the watermark past
    # 10:00 + window + delay, evicting u2's click as unmatched
    w(cdir, "c1.parquet", [(9, "2024-01-01 20:00:00", 109, 0.0)])
    w(pdir, "p1.parquet", [(9, "2024-01-01 20:01:00", 209, 1.0)])

    clicks = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1).parquet(cdir)
    purch = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1).parquet(pdir)
    out = clicks_to_purchases_outer(clicks, purch)
    q = (
        out.writeStream.format("memory").queryName("outer_attr")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.table("outer_attr").collect()
    }
    assert (101, 201) in got and (109, 209) in got
    assert (102, None) in got  # the null emission is the point

"""Streaming window aggregations over an event stream.

Batch twins of these (same logical shapes, oracle-checked) live in
queries.py (events_tumbling_window / events_sliding_window /
events_session_window); these are the readStream versions with
watermarks. At scale the state store holds one entry per open
window×key; the watermark bounds state growth — without it a
100 TB/day stream accumulates state forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts_stream(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling-window counts+sums with late-data drop.

    `events` must be a streaming DataFrame with (ts timestamp,
    event_type string, value double). Late rows beyond the watermark
    are dropped and their windows finalized — bounded state.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts_stream(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("bucket_start"), "n_events", "sum_value")
    )


def session_counts_stream(
    events: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows per user with a merge gap — the streaming form
    of the reference's 'activity burst' shape. State: one open session
    per user, closed when the watermark passes session end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )

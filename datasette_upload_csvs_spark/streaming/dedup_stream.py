"""Streaming deduplication: exactly-once semantics over at-least-once
event delivery — the stream twin of operators/dedup.py's exact path.

dropDuplicatesWithinWatermark keeps one state entry per key only
until the watermark passes, so state is bounded by the duplicate
arrival window, not stream history. (Plain dropDuplicates on a stream
without watermark grows state forever — never ship that.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_events_stream(
    events: DataFrame,
    key: str = "event_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop re-delivered events by key; duplicates arriving within
    `watermark` of the original are suppressed, later state evicted."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        [key]
    )

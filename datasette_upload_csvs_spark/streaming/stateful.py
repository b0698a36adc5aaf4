"""Custom stateful streaming operators via applyInPandasWithState.

The built-in windowed aggregations (windows.py) cover time-bucketed
state; this module is the escape hatch for state machines Spark has
no operator for. Example implemented here: per-user running totals
with event-time idle finalization — the state pattern behind
sessionized feature extraction in a training-data pipeline.

State per key: (n_events, sum_value). Timeout semantics are
event-time (watermark-driven): a user whose last event is `gap`
behind the watermark is finalized and evicted. Event-time (not
processing-time) matters operationally: a drain-and-stop run
(Trigger.AvailableNow) terminates deterministically instead of
spinning empty micro-batches waiting for wall-clock timers, and
replaying history produces identical results. State size is bounded
by *concurrently active* users, not input volume.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("finalized", LongType()),  # 1 if emitted by timeout
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

GAP_MS = 10 * 60 * 1000  # idle gap before a user is finalized


def _update(
    key: tuple,
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        n, s = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value": [s],
                "finalized": [1],
            }
        )
        return
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    # finalize when the watermark passes last-activity + gap
    state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + GAP_MS)
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [s],
            "finalized": [0],
        }
    )


def running_user_totals(
    events: DataFrame, watermark: str = "1 minute"
) -> DataFrame:
    """Streaming per-user running (n_events, sum_value) with
    event-time idle finalization. `events` must be a streaming frame
    with (ts timestamp, user_id, value)."""
    return (
        events.select("ts", "user_id", "value")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

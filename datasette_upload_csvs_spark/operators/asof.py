"""As-of (most-recent-prior) join — an operator Spark has no builtin
for, composed from union + window so it scales.

The naive formulation is a range join (for each left row, the right
row with the greatest ts ≤ left.ts) — O(n·m) nested-loop territory.
The scalable shape used here is the classic union trick:

  1. union left and right rows with a marker, carrying right-side
     payload columns as nulls on left rows;
  2. one window per key ordered by (ts, marker) with
     last(payload, ignorenulls=True) — each left row picks up the
     most recent right payload at or before its timestamp;
  3. filter back to left rows.

Cost: ONE shuffle on the key + a per-partition sort — the same plan
as any windowed aggregation, regardless of how many right rows
precede each left row. This is how kdb/QuestDB-style ASOF JOIN is
expressed on a shuffle architecture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row: the right row's payload with the greatest
    right_ts ≤ left_ts within the same `on` key (ties: right row
    sorts first, so an exactly-simultaneous right row is visible).

    Returns all left columns plus `<payload><suffix>` columns and
    `<right_ts><suffix>`.
    """
    right_payload = right_payload or []
    lcols = left.columns

    lm = left.withColumn("_is_left", F.lit(1)).withColumn(
        "_ts", F.col(left_ts)
    )
    for c in right_payload:
        if c not in lm.columns:
            lm = lm.withColumn(c, F.lit(None))
    rm = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.col(c) for c in right_payload],
    )
    for c in lcols:
        if c not in rm.columns:
            rm = rm.withColumn(c, F.lit(None))

    unioned = lm.select(
        *lcols, "_is_left", "_ts", *[c for c in right_payload if c not in lcols]
    ).unionByName(
        rm.select(
            *lcols,
            "_is_left",
            "_ts",
            *[c for c in right_payload if c not in lcols],
        )
    )

    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked = unioned.withColumn(
        f"{right_ts}{suffix}",
        F.last(F.when(F.col("_is_left") == 0, F.col("_ts")), ignorenulls=True).over(w),
    )
    for c in right_payload:
        picked = picked.withColumn(
            f"{c}{suffix}",
            F.last(
                F.when(F.col("_is_left") == 0, F.col(c)), ignorenulls=True
            ).over(w),
        )
    return picked.filter(F.col("_is_left") == 1).select(
        *lcols,
        f"{right_ts}{suffix}",
        *[f"{c}{suffix}" for c in right_payload],
    )

"""Skew-mitigation utilities.

AQE (enabled in session.py) already splits skewed partitions in
sort-merge joins at runtime. These helpers cover the cases AQE does
not: skewed *aggregations* whose per-key state is heavy (distinct
sets, collect_list) and skewed broadcast-impossible joins.

Pattern: salt the hot key into `salt` sub-keys, aggregate partially
per (key, salt) — spreading one hot key over `salt` reducers — then
merge the partials per key. Results are exactly equal to the unsalted
aggregation; only the shuffle distribution changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    salt: int = 16,
) -> DataFrame:
    """COUNT(DISTINCT value) per key, skew-resistant.

    Phase 1 dedups (key, value) pairs sharded by value-hash salt —
    a hot key's distinct-set build is spread over `salt` tasks.
    Phase 2 sums the shard counts (shards partition the value space,
    so counts add exactly).
    """
    salted = df.select(
        group_col,
        value_col,
        F.pmod(F.xxhash64(F.col(value_col)), F.lit(salt)).alias("_salt"),
    )
    partial = (
        salted.dropDuplicates([group_col, value_col])
        .groupBy(group_col, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return partial.groupBy(group_col).agg(
        F.sum("_partial").alias(f"n_distinct_{value_col}")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt: int = 8,
    left_salt_source: Column | None = None,
) -> DataFrame:
    """Inner equi-join resistant to a skewed left key.

    Left rows get a deterministic salt in [0, salt); the right side is
    replicated `salt` times. The join key becomes (key, salt), so a
    hot key's rows land on `salt` different reducers instead of one.
    Use when the right side is too big to broadcast and AQE's skew
    split is unavailable (e.g. shuffled-hash strategy).
    """
    if left_salt_source is None:
        left_salt_source = F.xxhash64(*[F.col(c) for c in left.columns])
    l_salted = left.withColumn("_salt", F.pmod(left_salt_source, F.lit(salt)))
    r_replicated = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return l_salted.join(
        r_replicated,
        (F.col(left_key) == F.col(right_key))
        & (l_salted["_salt"] == r_replicated["_salt"]),
    ).drop("_salt")

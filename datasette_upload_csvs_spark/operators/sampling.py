"""Deterministic, content-defined sampling.

Spark's sample()/sampleBy() draw from a seeded RNG whose stream
depends on partitioning — results change under repartition, AQE
re-planning, or engine version. A training-data pipeline needs the
OPPOSITE: membership decided by the row's own content, so a sample
is reproducible across runs, engines, and cluster layouts, and is
stable under incremental reprocessing (a doc's verdict never changes
because other docs arrived).

Mechanism: md5-low-64 of the key (the md5_number_lower convention,
operators/export.py) scaled to [0,1); keep rows below the fraction.
Uniformity comes from md5; determinism from content; cross-engine
verification from DuckDB computing the identical digest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datasette_upload_csvs_spark.operators.export import md5_low64

# md5_low64 is uniform on [0, 2^64); compare against fraction * 2^64
_TWO64 = 1 << 64


def sample_key(col: Column) -> Column:
    """[0,1) uniform deterministic score for a key column."""
    return (md5_low64(col) / F.lit(float(_TWO64))).cast("double")


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float
) -> DataFrame:
    """Keep ~fraction of rows, chosen by content hash of key_col.

    Map-side only: no shuffle, no RNG state, pushdown-friendly
    (the filter is a plain expression over one column).
    """
    return df.filter(sample_key(F.col(key_col)) < fraction)


def stratified_sample(
    df: DataFrame, key_col: str, strata_col: str, fractions: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic sampling (sampleBy's contract, made
    reproducible). Strata absent from `fractions` are dropped —
    sampleBy semantics. Still one map-side filter."""
    frac = None
    for value, f in fractions.items():
        cond = F.col(strata_col) == value
        frac = F.when(cond, F.lit(f)) if frac is None else frac.when(cond, F.lit(f))
    frac = frac.otherwise(F.lit(0.0))
    return df.filter(sample_key(F.col(key_col)) < frac)


def weighted_sample(
    df: DataFrame, key_col: str, weight_col: str, k: int
) -> DataFrame:
    """Weighted random sample WITHOUT replacement, deterministic.

    Efraimidis–Spirakis A-Res: each row draws u ~ U(0,1) and scores
    u^(1/w); the k largest scores are the sample — inclusion
    probability proportional to weight, exactly one pass. Our u is
    the content hash (sample_key), so the "draw" is reproducible
    cross-engine and stable under repartition. Plan: map-side score
    + global top-k (TakeOrderedAndProject — no full sort).

    Rows with weight <= 0 are excluded up front: zero weight means
    never sampled by definition, and a negative weight would invert
    the score (u^(1/w) > 1, always sampled) — a silent corruption
    of the sample, not a sample.
    """
    score = F.pow(sample_key(F.col(key_col)), 1.0 / F.col(weight_col))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_ws", score)
        .orderBy(F.col("_ws").desc(), F.col(key_col).asc())
        .limit(k)
        .drop("_ws")
    )


def sample_n_per_group(
    df: DataFrame, key_col: str, group_col: str, n: int
) -> DataFrame:
    """Exactly min(n, |group|) rows per group, chosen by content-hash
    order (deterministic sampleBy-with-exact-counts). One shuffle on
    the group key; WindowGroupLimit prunes to n per group map-side
    before the exchange."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        sample_key(F.col(key_col)).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )

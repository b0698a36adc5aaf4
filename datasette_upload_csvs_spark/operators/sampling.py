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

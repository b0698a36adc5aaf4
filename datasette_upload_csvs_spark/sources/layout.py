"""Range-clustered parquet layout: sort-based data skipping.

Partition directories (sources/partitioned.py) skip at directory
granularity and only work for low-cardinality columns. For the
continuous columns every time-series query filters on (ship date,
event time), the skipping unit is the parquet ROW GROUP: the reader
compares each row group's min/max footer stats against the pushed
predicate and skips non-overlapping groups without decoding them.

That only pays off if the data is clustered — random layout makes
every row group's [min,max] span the whole domain and nothing skips.
`cluster_by` fixes the layout: `repartitionByRange` gives files
PROVABLY DISJOINT key ranges (range partitioner), and
`sortWithinPartitions` orders rows inside each file so row groups
tile the range. A date-range query then decodes ~selectivity × data
instead of all of it. This is the single-column form of what
warehouse engines sell as Z-ordering/clustering keys; at 100 TB it
is the difference between a scan and a seek.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def cluster_by(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write df as `num_files` parquet files with disjoint sorted
    ranges of `cols` (lexicographic for multi-column)."""
    (
        df.repartitionByRange(num_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )


def file_ranges(path: str, column: str) -> list[tuple]:
    """(min, max) of `column` per parquet file — the footer stats the
    reader's row-group skipping consults. Disjointness across files is
    the clustering invariant tests assert."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        meta = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}[column]
        lo, hi = None, None
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return []  # stats missing — caller decides
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((lo, hi))
    return out


def read_clustered(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16):
    """Z-order (Morton) key column: bit-interleave of min-max-scaled
    numeric columns.

    Lexicographic clustering (cluster_by) skips perfectly on the
    leading column and not at all on the others; interleaving the
    columns' bits makes every file's footer range narrow in EVERY
    dimension — the multi-column skipping trick warehouse engines
    ship as Z-ordering. Scaling constants come from one min/max
    aggregation (write-time cost, amortized over every later read).
    Returns (key Column, stats row) — the caller attaches the key,
    range-partitions by it, and drops it before writing.
    """
    from pyspark.sql import functions as F

    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    st = df.agg(*aggs).collect()[0]
    scaled = []
    top = (1 << bits) - 1
    for c in cols:
        lo, hi = float(st[f"{c}_min"]), float(st[f"{c}_max"])
        span = (hi - lo) or 1.0
        scaled.append(
            F.least(
                F.lit(top),
                F.floor((F.col(c).cast("double") - F.lit(lo))
                        / F.lit(span) * F.lit(top + 1)).cast("long"),
            )
        )
    n = len(cols)
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, s in enumerate(scaled):
            key = key + F.shiftleft(
                F.shiftright(s, i).bitwiseAND(F.lit(1)), i * n + j
            ).cast("long")
    return key, st


def zorder_cluster(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write df z-order-clustered on `cols`: range-partition and sort
    by the Morton key so every file covers a small hyper-rectangle of
    the key space — row-group skipping works on all of `cols`, not
    just the first."""
    key, _ = zorder_key(df, cols, bits)
    (
        df.withColumn("_z", key)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def compact_files(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
    sort_cols: list[str] | None = None,
) -> tuple[int, int]:
    """Rewrite a parquet directory into ~target_mb files.

    Streaming sinks and incremental appends accumulate small files;
    at scale the file count, not the byte count, becomes the
    bottleneck (driver listing, task scheduling, footer reads — a
    million 1 MB files is an outage, the same data in 8 GB files is
    routine). One pass: size the directory, coalesce (narrow — no
    shuffle) unless a sort order is requested, rewrite via a staging
    directory swapped in by rename. (The remove+rename pair is not
    one atomic step: a reader racing the swap can see a missing
    directory — serialize compaction with readers, or compact into
    a NEW path and flip a catalog/table pointer for true atomicity.)
    Returns (files_before, files_after).
    """
    import math
    import os
    import shutil

    def parquet_parts(p):
        return [
            f for f in os.listdir(p)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        ]

    before = parquet_parts(path)
    total = sum(os.path.getsize(os.path.join(path, f)) for f in before)
    n_out = max(1, math.ceil(total / (target_mb * 1024 * 1024)))

    df = spark.read.parquet(path)
    stage = path.rstrip("/") + "__compact"
    if sort_cols:
        out = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.coalesce(n_out)
    out.write.mode("overwrite").parquet(stage)
    shutil.rmtree(path)
    os.rename(stage, path)
    return len(before), len(parquet_parts(path))

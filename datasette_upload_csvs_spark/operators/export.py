"""Training-shard export: deterministic, content-defined sharding.

The last stage of a curation pipeline (pipeline.py) is writing the
corpus as N fixed shards that trainers stream independently. Two
properties matter at 100 TB:

- **Content-defined assignment.** shard(doc) must be a pure function
  of the document id — not of partitioning, executor count, or
  engine — so a re-run, a different cluster, or a different engine
  produces byte-identical shard membership (resumable exports,
  cross-system verification). We use md5's low 64 bits, the same
  portable-hash construction as feature hashing (queries.py
  feature_hashing_buckets): every engine has md5; nobody agrees on
  xxhash/murmur seeds.
- **One file per shard.** `repartition(shard_id)` before a
  partitioned write gives each shard directory exactly one file of
  ~corpus/N rows — the layout trainers want, produced with a single
  shuffle.

Reference parity note: the reference's terminal stage is
`insert_all` into one SQLite file (reference `__init__.py:168`);
sharded export is the Spark-scale analogue of "hand the data to the
consumer".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def md5_low64(col: Column) -> Column:
    """Little-endian uint64 of md5 bytes 9..16 — equals DuckDB's
    md5_number_lower, so assignments verify cross-engine. Returned as
    DECIMAL(20,0) (the value exceeds int64 range)."""
    h = F.md5(col.cast("string"))
    le_hex = F.concat(*[F.substring(h, 17 + 2 * i, 2) for i in reversed(range(8))])
    return F.conv(le_hex, 16, 10).cast("decimal(20,0)")


def assign_shards(
    df: DataFrame, id_col: str = "doc_id", num_shards: int = 16
) -> DataFrame:
    """Add a content-defined `shard_id` in [0, num_shards)."""
    return df.withColumn(
        "shard_id", F.pmod(md5_low64(F.col(id_col)), F.lit(num_shards)).cast("int")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    num_shards: int = 16,
    split_col: str | None = None,
) -> None:
    """Write df as hive directories shard_id=K (nested under
    split=… when split_col is given), one parquet file per shard."""
    sharded = assign_shards(df, id_col, num_shards)
    cols = ([split_col] if split_col else []) + ["shard_id"]
    sharded.repartition(*cols).write.mode("overwrite").partitionBy(*cols).parquet(path)


def balanced_shards(
    df: DataFrame,
    size_col: str,
    id_col: str = "doc_id",
    num_shards: int = 16,
    salt_buckets: int = 32,
) -> DataFrame:
    """Size-balanced shard assignment: rank docs by
    (size desc, salt, id) and deal them round-robin — the classic
    LPT-style balancing that keeps per-shard token totals within one
    max-doc of each other (plain hash sharding balances doc COUNTS,
    not token WORK; skewed doc lengths then skew tokenizer/training
    throughput per shard).

    The global rank is computed WITHOUT a global window: (1) row
    counts per (size, salt) band (tiny aggregate), (2) exclusive
    prefix over those bands — the only single-partition window runs
    over ≤ distinct-sizes × salt_buckets rows, (3) within-band
    row_number partitioned by (size, salt). rank = band_prefix +
    within-band position, bit-identical to ROW_NUMBER() OVER
    (ORDER BY size DESC, salt, id) at any parallelism.

    The salt is the de-skew guard: LLM corpora concentrate sizes
    (docs truncated/packed to exactly the context length all share
    one size value), and an unsalted within-band row_number would
    funnel that hot band through a single task. salt =
    md5_low64(id) % salt_buckets is content-defined (engine-portable,
    partition-independent), so the canonical order — and therefore
    every shard assignment — stays deterministic while a hot band
    fans out across salt_buckets tasks. Balance quality is unchanged:
    round-robin dealing only needs sizes descending; order WITHIN a
    size band is arbitrary for the balancing property. Same two-phase
    shape as curation.pack_concat_chunks.
    """
    base = df.select(
        F.col(id_col),
        F.col(size_col).alias("_n"),
        F.pmod(md5_low64(F.col(id_col)), F.lit(salt_buckets))
        .cast("int")
        .alias("_salt"),
    )
    wb = Window.orderBy(F.desc("_n"), F.asc("_salt")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = (
        base.groupBy("_n", "_salt")
        .agg(F.count("*").alias("_c"))
        .withColumn("_prefix", F.coalesce(F.sum("_c").over(wb), F.lit(0)))
        .select("_n", "_salt", "_prefix")
    )
    rn = F.row_number().over(
        Window.partitionBy("_n", "_salt").orderBy(id_col)
    )
    rank = F.col("_prefix") + rn
    return (
        base.join(F.broadcast(prefix), ["_n", "_salt"])
        .select(
            F.col(id_col),
            F.col("_n").alias(size_col),
            F.pmod(rank - 1, F.lit(num_shards)).cast("int").alias("shard_id"),
        )
    )

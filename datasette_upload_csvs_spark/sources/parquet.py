"""Parquet table reader for the driver's test corpus.

Handles the one schema quirk: events.ts is parquet TIMESTAMP(NANOS),
which Spark has no type for — read as long (nanosAsLong) and truncate
to micros with exact integer division (identical to how DuckDB reads
the same column, so oracle comparisons see identical instants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")

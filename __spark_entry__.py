"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship query (TPC-H Q1-shaped pricing summary)
                    on /root/testdata/sf0.001.
queries()         — named (spark, sf_dir) -> DataFrame callables, one
                    per implemented operator from SURVEY.md §2.
oracle_sql()      — DuckDB-runnable ANSI SQL twin per query.

Implementations live in datasette_upload_csvs_spark/ (queries.py is
the registry; operators/ holds the extension operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datasette_upload_csvs_spark import queries as Q
from datasette_upload_csvs_spark.session import configure


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    configure(spark)
    return Q.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()

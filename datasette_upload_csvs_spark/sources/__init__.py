"""Data sources and storage-layout helpers.

CSV ingest (the reference's whole surface) lives in ingest.py;
this package holds the parquet reader used by the query registry and
the bucketed-table layout that removes the shuffle from repeated
large-table equi-joins.
"""

from datasette_upload_csvs_spark.sources.parquet import read_table  # noqa: F401
from datasette_upload_csvs_spark.sources.bucketed import (  # noqa: F401
    write_bucketed,
    bucketed_join_ready,
)

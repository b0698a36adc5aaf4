"""Extension operators beyond the reference surface.

The reference (simonw/datasette-upload-csvs) implements ingest only
and delegates all querying to SQLite; these are the LLM-data-pipeline
operators the BASELINE.json north star mandates on top: dedup,
similarity search, text analysis, multimodal column plumbing.
"""

from datasette_upload_csvs_spark.operators import dedup  # noqa: F401
from datasette_upload_csvs_spark.operators import similarity  # noqa: F401
from datasette_upload_csvs_spark.operators import textstats  # noqa: F401
from datasette_upload_csvs_spark.operators import multimodal  # noqa: F401

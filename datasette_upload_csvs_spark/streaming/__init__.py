"""Structured Streaming surface.

The reference's ingest is itself a micro-batch stream (100-row
batches with progress ticks, reference __init__.py:173-198); this
package provides the genuine streaming equivalents: file-source CSV
ingest with foreachBatch progress, and windowed/sessionized event
aggregation with watermarks for late data.
"""

from datasette_upload_csvs_spark.streaming.windows import (  # noqa: F401
    tumbling_counts_stream,
    sliding_counts_stream,
    session_counts_stream,
)
from datasette_upload_csvs_spark.streaming.ingest_stream import (  # noqa: F401
    stream_csv_to_table,
)

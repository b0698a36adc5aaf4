"""datasette_upload_csvs_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of
simonw/datasette-upload-csvs (reference: /root/reference, Apache-2.0):
CSV ingest with encoding detection, dynamic schema, full-scan
{int, float, text} type inference, name-collision handling and
progress tracking — plus the full delegated SQL query surface
(the reference delegates querying to SQLite via Datasette;
we provide it via Spark SQL / Catalyst) and the LLM-data-pipeline
extension operators (dedup, similarity search, text analysis,
multimodal column plumbing) designed for 100 TB scale.

Everything here is plain PySpark 4.x DataFrame/SQL code — no RDDs,
no custom Catalyst rules. See SURVEY.md for the blueprint.
"""

from datasette_upload_csvs_spark.session import get_spark  # noqa: F401
from datasette_upload_csvs_spark.ingest import upload_csv, IngestResult  # noqa: F401

__version__ = "0.1.0"

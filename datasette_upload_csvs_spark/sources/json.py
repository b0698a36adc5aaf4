"""Newline-delimited JSON source (beyond the reference's CSV-only
upload surface — same deferred-typing philosophy).

Design notes for scale:
- An explicit schema makes the read a SINGLE streaming pass, exactly
  like the CSV path. Schema inference (`infer=True`) costs one full
  extra scan of the data before the real one — acceptable at
  gigabytes, a planning disaster at 100 TB. Default is
  all-inferred-off: pass a schema, or take everything as string via
  `primitivesAsString` and run the same cast-probe lattice the CSV
  ingest uses (ingest.infer_column_types).
- PERMISSIVE + columnNameOfCorruptRecord mirrors the CSV ragged-row
  stance (reference `__init__.py:180` dict(zip…) never throws): a
  malformed line lands in `_corrupt_record` instead of failing the
  job; callers quarantine with `filter(_corrupt_record IS NOT NULL)`.
- `.gz` inputs decompress by extension, like the CSV scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


def read_ndjson(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    infer: bool = False,
) -> DataFrame:
    """Read newline-delimited JSON with corrupt-line capture.

    schema=None + infer=False → every primitive arrives as string
    (one pass, no sampling surprises), ready for the ingest type
    lattice. schema given → typed single-pass read.
    """
    reader = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if schema is not None:
        from pyspark.sql.types import StringType, StructField

        if isinstance(schema, str):
            # Spark only captures corrupt lines when the column is IN
            # the schema — append it for DDL strings too.
            schema = StructType.fromDDL(schema)
        if not any(f.name == CORRUPT_COL for f in schema.fields):
            schema = StructType(
                list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
            )
        reader = reader.schema(schema)
    elif not infer:
        reader = reader.option("primitivesAsString", "true")
    return reader.json(path)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the corrupt column, quarantined rows).

    Persists the parsed frame: Spark refuses plans over a raw JSON
    scan whose referenced columns are only the corrupt column
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN) unless cached — and the
    persist is also the right plan: one parse feeds BOTH outputs
    instead of re-scanning the source per branch. MEMORY_AND_DISK so
    a batch larger than executor memory spills instead of failing;
    caller unpersists when both branches are written.
    """
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    if CORRUPT_COL not in df.columns:
        return df, df.limit(0)
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad

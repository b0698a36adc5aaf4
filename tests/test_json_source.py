"""NDJSON source: typed single-pass read, corrupt-line quarantine,
string-mode default feeding the shared type lattice."""

import os

from datasette_upload_csvs_spark import ingest
from datasette_upload_csvs_spark.sources.json import (
    CORRUPT_COL,
    read_ndjson,
    split_corrupt,
)

LINES = (
    '{"name": "Cleo", "age": 5, "score": 1.5}\n'
    '{"name": "Pancakes", "age": 4, "score": 2.0}\n'
    "{this is not json}\n"
    '{"name": "Azi", "age": 7, "score": 3.25}\n'
)


def _write(tmp_path) -> str:
    p = os.path.join(tmp_path, "pets.ndjson")
    with open(p, "w") as f:
        f.write(LINES)
    return p


def test_typed_read_with_quarantine(spark, tmp_path):
    path = _write(tmp_path)
    df = read_ndjson(spark, path, schema="name string, age long, score double")
    clean, bad = split_corrupt(df)
    assert bad.count() == 1
    assert "{this is not json}" in bad.collect()[0][CORRUPT_COL]
    rows = {tuple(r) for r in clean.collect()}
    assert ("Cleo", 5, 1.5) in rows and len(rows) == 3


def test_string_mode_feeds_type_lattice(spark, tmp_path):
    path = _write(tmp_path)
    df = read_ndjson(spark, path)  # primitives-as-string, one pass
    clean, _ = split_corrupt(df)
    assert dict(clean.dtypes)["age"] == "string"
    types = ingest.infer_column_types(clean)
    assert types["age"] == "integer" and types["score"] == "float"
    assert types["name"] == "text"

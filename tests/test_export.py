"""Training-shard export: content-defined assignment (reproducible
anywhere) and one-file-per-shard layout."""

import hashlib
import os

from datasette_upload_csvs_spark.operators.export import (
    assign_shards,
    write_training_shards,
)
from datasette_upload_csvs_spark.sources.parquet import read_table


def _expected_shard(doc_id: int, n: int = 16) -> int:
    low = int.from_bytes(hashlib.md5(str(doc_id).encode()).digest()[8:16], "little")
    return low % n


def test_assignment_is_content_defined(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    got = {
        r["doc_id"]: r["shard_id"]
        for r in assign_shards(docs, "doc_id", 16).select("doc_id", "shard_id").collect()
    }
    assert len(got) == docs.count()
    assert all(0 <= s < 16 for s in got.values())
    for doc_id in list(got)[:25]:
        assert got[doc_id] == _expected_shard(doc_id), doc_id
    # deterministic across runs (no rand/partition dependence)
    again = {
        r["doc_id"]: r["shard_id"]
        for r in assign_shards(docs, "doc_id", 16).select("doc_id", "shard_id").collect()
    }
    assert got == again


def test_write_one_file_per_shard(spark, sf_dir, tmp_path):
    path = str(tmp_path / "shards")
    docs = read_table(spark, sf_dir, "documents")
    write_training_shards(docs, path, num_shards=8)
    shard_dirs = [d for d in os.listdir(path) if d.startswith("shard_id=")]
    assert len(shard_dirs) == 8
    for d in shard_dirs:
        files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
        assert len(files) == 1
    assert spark.read.parquet(path).count() == docs.count()

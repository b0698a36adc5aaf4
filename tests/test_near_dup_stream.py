"""Incremental near-dup detection must find exactly the pairs the
batch MinHash pipeline finds on the full corpus, regardless of how
documents are split across arrival batches."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from datasette_upload_csvs_spark.operators import dedup
from datasette_upload_csvs_spark.sources.parquet import read_table
from datasette_upload_csvs_spark.streaming.near_dup_stream import (
    maintain_near_dup_stream,
)


def test_stream_near_dup_equals_batch(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs_stream")
    os.makedirs(src)
    for i in range(3):
        part = docs.filter(F.pmod("doc_id", F.lit(3)) == i)
        d = str(tmp_path / f"p{i}")
        part.coalesce(1).write.mode("overwrite").parquet(d)
        name = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(d, name), os.path.join(src, f"arrival_{i}.parquet"))

    for t in ("nd_pairs", "nd_index", "nd_index__sets"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    n = maintain_near_dup_stream(
        spark, src, "doc_id bigint, text string",
        pairs_table="nd_pairs", index_table="nd_index", threshold=0.7,
    )
    assert n == 3

    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 10))
        for r in spark.table("nd_pairs").collect()
    }
    want = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 10))
        for r in dedup.minhash_near_dup_pairs(docs, threshold=0.7).collect()
    }
    assert got == want and got  # same pairs, no dupes, none missed
    # no pair is ever emitted twice across batches
    assert spark.table("nd_pairs").count() == len(got)
    for t in ("nd_pairs", "nd_index", "nd_index__sets"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")

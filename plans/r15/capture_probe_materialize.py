#!/usr/bin/env python
"""Plan evidence for the r15 phash/wide_fp survivor materialization
(semi_prune_fused(materialize=True)): the cap guard's consumers used
to re-derive the fingerprint-store scan + 4×-chunk Generate + semi
per subtree; with the eager survivor checkpoint they read one
materialized RDD (the plan below the cap shows `Scan ExistingRDD`
instead of the Scan parquet → Generate → BroadcastHashJoin
LeftSemi lineage).

Writes phash_hist_prune_{before,after}.txt next to this script,
built over a small synthetic fingerprint table in a temp warehouse.
"""
import io
import contextlib
import os
import shutil
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from pyspark.sql import functions as F

wh = tempfile.mkdtemp(prefix="plan_phash_wh_")
from datasette_upload_csvs_spark.session import get_spark

spark = get_spark(app_name="plan-capture-probe-mat", warehouse_dir=wh)
spark.sparkContext.setLogLevel("ERROR")

from datasette_upload_csvs_spark.operators import dedup as _dedup
from datasette_upload_csvs_spark.operators.multimodal import (
    perceptual_hashes,
)
from datasette_upload_csvs_spark.streaming.near_dup_stream import (
    semi_prune_fused,
)
from datasette_upload_csvs_spark.streaming.phash_stream import _fp_chunks


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


media = spark.range(2000).select(
    F.col("id").alias("media_id"),
    F.expr(
        "unhex(concat(md5(cast(id as string)), "
        "md5(cast(id + 17 as string))))"
    ).alias("payload"),
)
fp = perceptual_hashes(media).select("media_id", "dhash64")
fp.write.mode("overwrite").saveAsTable("plan_fp")
hist = spark.table("plan_fp")

batch = spark.range(2000, 2400).select(
    F.col("id").alias("media_id"),
    F.expr(
        "unhex(concat(md5(cast(id as string)), "
        "md5(cast(id + 17 as string))))"
    ).alias("payload"),
)
new_chunks = _fp_chunks(
    perceptual_hashes(batch).select("media_id", "dhash64"), "media_id"
)

for tag, mat in (("before", False), ("after", True)):
    pruned = semi_prune_fused(
        _fp_chunks(hist, "media_id"),
        new_chunks,
        ["chunk", "val"],
        True,
        materialize=mat,
    )
    capped = _dedup.cap_bucket_side(
        pruned, ["chunk", "val"], "media_id", "auto"
    )
    desc = (
        "MATERIALIZED survivors (Scan ExistingRDD below every cap "
        "subtree)"
        if mat
        else "lazy semi lineage (scan + chunk Generate + LeftSemi "
        "re-derived per cap subtree)"
    )
    with open(
        os.path.join(HERE, f"phash_hist_prune_{tag}.txt"), "w"
    ) as f:
        f.write(f"== {tag.upper()}: cap_bucket_side over the {desc} ==\n")
        f.write(_explain(capped))
print("wrote phash_hist_prune_{before,after}.txt")
shutil.rmtree(wh, ignore_errors=True)

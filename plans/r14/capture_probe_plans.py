#!/usr/bin/env python
"""Focused plan capture for the r14 auto-cap probe shave: explain the
candidate-pair frame minhash_lsh_candidates returns under
bucket_star_cap="auto" (no-op regime at this corpus), before vs after.

Before (r13): the probe persists the full BANDED relation; the main
self-join reads `InMemoryTableScan [doc_id, band, bucket]` directly.
After (r14): the probe persists the SIGNATURE relation; the main
self-join recomputes the banding layer (codegen xxhash64/explode) on
top of `InMemoryTableScan [doc_id, signature]`, and the second join
side collapses to a ReusedExchange — same exchange count, bands× fewer
cached rows, probe job 1/8 the explode.

Usage: python plans/r14/capture_probe_plans.py <tag>
"""
import io
import os
import sys
import contextlib

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

tag = sys.argv[1] if len(sys.argv) > 1 else "after"

from pyspark.sql import functions as F

from datasette_upload_csvs_spark.operators import dedup
from datasette_upload_csvs_spark.queries import load
from datasette_upload_csvs_spark.session import get_spark

spark = get_spark(app_name="probe-plan-capture")
spark.sparkContext.setLogLevel("ERROR")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

docs = load(spark, sf, "documents")
sig = dedup.minhash_signatures(docs, text_col="text", id_col="doc_id")
cand = dedup.minhash_lsh_candidates(sig, bucket_star_cap="auto")
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    cand.explain("formatted")
with open(os.path.join(HERE, f"minhash_lsh_candidates_auto_{tag}.txt"), "w") as f:
    f.write(buf.getvalue())
print(f"wrote minhash_lsh_candidates_auto_{tag}.txt")

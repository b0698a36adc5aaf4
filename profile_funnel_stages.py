#!/usr/bin/env python
"""One-off diagnostic: per-stage wall time of run_curation_funnel at
sf0.1 under bucket_star_cap auto vs None, in one process, alternated.
Uses the funnel's own run_stage hook so each stage's jobs are timed in
isolation. Prints a per-stage table; not a filed artifact — the filed
A/B is BENCH_FUNNEL_CODEAB.json."""
from __future__ import annotations

import os
import time

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F

from datasette_upload_csvs_spark.pipeline import run_curation_funnel
from datasette_upload_csvs_spark.queries import _FLOOR_MAX_DF, load
from datasette_upload_csvs_spark.session import get_spark

spark = get_spark(app_name="funnel_stage_profile")
spark.sparkContext.setLogLevel("ERROR")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
d = load(spark, sf, "documents")
docs = d.filter(F.pmod("doc_id", F.lit(10)) != 0)
bench = d.filter(F.pmod("doc_id", F.lit(10)) == 0)


def run(cap):
    times = {}

    def run_stage(name, thunk):
        t0 = time.perf_counter()
        out = thunk()
        times[name] = round(time.perf_counter() - t0, 3)
        return out

    t0 = time.perf_counter()
    run_curation_funnel(
        docs, benchmark=bench, exact_floor_max_df=_FLOOR_MAX_DF,
        bucket_star_cap=cap, run_stage=run_stage,
    )
    times["TOTAL"] = round(time.perf_counter() - t0, 3)
    spark.catalog.clearCache()
    return times


# warmup both modes once, then 2 alternated timed passes each
for cap in ("auto", None, "auto", None, "auto", None):
    label = "auto" if cap == "auto" else "none"
    t = run(cap)
    print(f"{label}: {t}", flush=True)

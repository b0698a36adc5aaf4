#!/usr/bin/env python
"""Capture .explain('formatted') for r14-touched queries into
plans/r14/<query>_<tag>.txt. The staged-funnel entry is a materializing
pipeline whose returned frame is a local stage-count table, so for it
the per-STAGE executed plans (capture_plans=True) are written instead —
the near-dup stage plan is the one the r14 release/scratch change
routes through the scratch-checkpoint path."""
import io
import os
import sys
import contextlib

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

tag = sys.argv[1] if len(sys.argv) > 1 else "after"
names = sys.argv[2:] or ["dedup_groups", "split_cluster_safe"]

import __spark_entry__ as entry
from datasette_upload_csvs_spark.session import get_spark

spark = get_spark(app_name="plan-capture")
spark.sparkContext.setLogLevel("ERROR")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
registry = entry.queries()

for name in names:
    if name == "curation_funnel_staged":
        from pyspark.sql import functions as F

        from datasette_upload_csvs_spark.pipeline import run_curation_funnel
        from datasette_upload_csvs_spark.queries import _FLOOR_MAX_DF, load

        d = load(spark, sf, "documents")
        stages, _, _ = run_curation_funnel(
            d.filter(F.pmod("doc_id", F.lit(10)) != 0),
            benchmark=d.filter(F.pmod("doc_id", F.lit(10)) == 0),
            exact_floor_max_df=_FLOOR_MAX_DF,
            release_stage_frames=True,
            capture_plans=True,
        )
        with open(os.path.join(HERE, f"{name}_{tag}.txt"), "w") as f:
            for s in stages:
                f.write(f"==== stage {s.name} (n_docs={s.n_docs}) ====\n")
                f.write((s.plan or "<no plan captured>") + "\n\n")
    else:
        df = registry[name](spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(HERE, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
    print(f"wrote {name}_{tag}.txt")

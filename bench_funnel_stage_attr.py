#!/usr/bin/env python
"""Per-STAGE attribution of the staged-funnel auto-cap premium (r13
VERDICT item 3 residual): run run_curation_funnel with a run_stage
timer, auto vs cap=None, alternating within-pair order, and report
per-stage walls — so the ~1.1 s premium the interleaved twins show is
pinned to a stage (expected: near_dup_groups, where the auto probe
persists the banded relation and runs its subset aggregate).

Writes BENCH_FUNNEL_STAGE_ATTR.json (section = --section).
"""
from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    section = "base"
    if "--section" in sys.argv:
        section = sys.argv[sys.argv.index("--section") + 1]
    pairs = int(os.environ.get("ATTR_PAIRS", "4"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from datasette_upload_csvs_spark.pipeline import run_curation_funnel
    from datasette_upload_csvs_spark.queries import _FLOOR_MAX_DF, load
    from datasette_upload_csvs_spark.session import get_spark

    spark = get_spark(app_name="funnel-stage-attr")
    spark.sparkContext.setLogLevel("ERROR")
    d = load(spark, sf, "documents")
    docs = d.filter(F.pmod("doc_id", F.lit(10)) != 0)
    bench = d.filter(F.pmod("doc_id", F.lit(10)) == 0)

    def one(cap) -> dict:
        stage_walls: dict[str, float] = {}

        def run_stage(name, thunk):
            t0 = time.perf_counter()
            out = thunk()
            stage_walls[name] = round(time.perf_counter() - t0, 3)
            return out

        t0 = time.perf_counter()
        run_curation_funnel(
            docs, benchmark=bench, exact_floor_max_df=_FLOOR_MAX_DF,
            bucket_star_cap=cap, run_stage=run_stage,
            release_stage_frames=True,
        )
        stage_walls["TOTAL"] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        return stage_walls

    runs: dict[str, list[dict]] = {"auto": [], "none": []}
    for i in range(pairs + 1):  # pair 0 discarded
        order = ("auto", "none") if i % 2 == 0 else ("none", "auto")
        for mode in order:
            w = one("auto" if mode == "auto" else None)
            if i > 0:
                runs[mode].append(w)
            print(f"# pair {i} {mode}: {w}", file=sys.stderr)

    def med(mode, key):
        vals = sorted(r.get(key, 0.0) for r in runs[mode])
        return vals[len(vals) // 2]

    keys = sorted({k for r in runs["auto"] + runs["none"] for k in r})
    table = {
        k: {"auto": med("auto", k), "none": med("none", k),
            "delta": round(med("auto", k) - med("none", k), 3)}
        for k in keys
    }
    out = {"sf": sf, "pairs": pairs, "stage_medians": table}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_FUNNEL_STAGE_ATTR.json")
    try:
        with open(path) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        doc = {}
    doc[section] = out
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps(table))


if __name__ == "__main__":
    main()

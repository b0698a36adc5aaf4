#!/usr/bin/env python
"""Per-JOB/STAGE profile of one registry query (guide §1/§7): run the
query bench-style (count after one discarded warmup) in a fresh
session and dump every job and stage the timed run executed — wall,
executor task time, shuffle read/write bytes, input bytes — from the
status-store REST API. Attributes a query's wall to scheduling
(many small jobs) vs one heavy stage vs shuffle.

Usage: bench_query_stages.py <query> [<query> ...]
Writes BENCH_QUERY_STAGES.json keyed by query name.
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request


def _rest(spark, path):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}") as r:
        return json.load(r)


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry
    from datasette_upload_csvs_spark.session import get_spark

    spark = get_spark(
        app_name="query-stages",
        # the profiler reads completed stages back from the UI store;
        # raise retention so nothing is evicted mid-read (the meter
        # benches do the same — see _ShuffleMeter)
        extra_confs={"spark.ui.retainedStages": "5000",
                     "spark.ui.retainedJobs": "5000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = entry.queries()

    out = {}
    for name in names:
        fn = registry[name]
        fn(spark, sf).count()  # discarded warmup
        spark.catalog.clearCache()
        jobs_before = max(
            (j["jobId"] for j in _rest(spark, "jobs")), default=-1
        )
        t0 = time.perf_counter()
        fn(spark, sf).count()
        wall = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        jobs = [j for j in _rest(spark, "jobs") if j["jobId"] > jobs_before]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = []
        for s in _rest(spark, "stages?status=complete"):
            if s["stageId"] not in stage_ids:
                continue
            dur = None
            if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
                from datetime import datetime

                def _t(x):
                    return datetime.strptime(
                        x.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f"
                    )

                dur = round(
                    (_t(s["completionTime"])
                     - _t(s["firstTaskLaunchedTime"])).total_seconds(), 3
                )
            stages.append({
                "stage": s["stageId"],
                "wall_s": dur,
                "task_time_s": round(s.get("executorRunTime", 0) / 1e3, 2),
                "tasks": s.get("numCompleteTasks"),
                "input_mb": round(s.get("inputBytes", 0) / 2**20, 1),
                "sh_read_mb": round(s.get("shuffleReadBytes", 0) / 2**20, 1),
                "sh_write_mb": round(
                    s.get("shuffleWriteBytes", 0) / 2**20, 1),
                "name": s.get("name", "")[:90],
            })
        stages.sort(key=lambda r: -(r["wall_s"] or 0))
        job_rows = [
            {
                "job": j["jobId"],
                "wall_s": _job_wall(j),
                "desc": (j.get("description") or j.get("name", ""))[:90],
                "stages": j["stageIds"],
            }
            for j in sorted(jobs, key=lambda j: j["jobId"])
        ]
        out[name] = {
            "wall_s": wall,
            "n_jobs": len(jobs),
            "jobs": job_rows,
            "stages_by_wall": stages[:14],
        }
        print(f"# {name}: wall {wall}s, {len(jobs)} jobs", file=sys.stderr)
        for j in job_rows:
            print(f"#   job {j['job']} {j['wall_s']}s {j['desc']}",
                  file=sys.stderr)
        for s in stages[:8]:
            print(
                f"#   stage {s['stage']} wall {s['wall_s']}s task "
                f"{s['task_time_s']}s x{s['tasks']} in {s['input_mb']}MB "
                f"shr {s['sh_read_mb']}MB shw {s['sh_write_mb']}MB "
                f"| {s['name'][:60]}",
                file=sys.stderr,
            )

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_QUERY_STAGES.json")
    try:
        with open(path) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        doc = {}
    doc.update(out)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps({k: {"wall_s": v["wall_s"], "n_jobs": v["n_jobs"]}
                      for k, v in out.items()}))


def _job_wall(j) -> float | None:
    from datetime import datetime

    a, b = j.get("submissionTime"), j.get("completionTime")
    if not a or not b:
        return None

    def _t(x):
        return datetime.strptime(
            x.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")

    return round((_t(b) - _t(a)).total_seconds(), 3)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Same-host alternating-PROCESS A/B: r9 code vs r10+ head, for the two
simhash-tier entries whose r10 cross-round medians moved
(simhash_dup_groups +16%, simhash128_dup_groups +38%) on the round's
changed CC path (graph.py converge-or-raise via Observation).

Protocol (round-10 VERDICT item 1 / the BENCH_SIMHASH_AB.json recipe,
upgraded from in-process-alternating to process-alternating so JVM/GC
state can't leak between modes):
  - modes = {r9: git worktree at d10e142, head: this tree}
  - ROUNDS alternating fresh subprocesses, order r9,head,r9,head,...
  - each subprocess: fresh SparkSession local[32], per-mode warmup of
    BOTH queries (untimed), clearCache, then one timed count() per query
  - >=5 timed samples per (mode, query); min + median + spread filed

Writes BENCH_SIMHASH_CODEAB.json. If the two modes' medians overlap
within spread, the r10 cross-round delta is host drift, not code.
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
MODES = {"r9": os.path.join(HERE, ".ab_r9"), "head": HERE}
QUERIES = ["simhash_dup_groups", "simhash128_dup_groups"]
ROUNDS = int(os.environ.get("AB_ROUNDS", "5"))

CHILD = r"""
import json, os, sys, time
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
from datasette_upload_csvs_spark.session import get_spark
import __spark_entry__ as entry
spark = get_spark(app_name="simhash_codeab")
spark.sparkContext.setLogLevel("ERROR")
q = entry.queries()
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
names = json.loads(os.environ["AB_QUERIES"])
for n in names:  # per-mode warmup: codegen/Arrow/footer caches paid
    q[n](spark, sf).count()
spark.catalog.clearCache()
out = {}
for n in names:
    t0 = time.perf_counter()
    q[n](spark, sf).count()
    out[n] = round(time.perf_counter() - t0, 3)
    spark.catalog.clearCache()
print("ABRESULT " + json.dumps(out))
"""


def run_child(tree: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = tree
    env["AB_QUERIES"] = json.dumps(QUERIES)
    proc = subprocess.run(
        [sys.executable, "-c", CHILD], cwd=tree, env=env,
        capture_output=True, text=True, timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"child in {tree} produced no ABRESULT; stderr tail: "
        + proc.stderr[-2000:]
    )


def main() -> None:
    samples: dict[str, dict[str, list[float]]] = {
        m: {q: [] for q in QUERIES} for m in MODES
    }
    order_log = []
    for i in range(ROUNDS):
        # alternate WHICH MODE RUNS FIRST each round: with a fixed
        # order, any within-round host drift (page cache, thermal,
        # JIT-warm OS state left by the first child) lands entirely
        # on the second mode and reads as a fake code delta — the
        # r10→r11 investigation found exactly this: plan-identical
        # code showing a consistent +0.5 s for whichever mode ran
        # second
        order = list(MODES.items())
        if i % 2 == 1:
            order.reverse()
        order_log.append([m for m, _ in order])
        for mode, tree in order:
            res = run_child(tree)
            for q, el in res.items():
                samples[mode][q].append(el)
            print(f"# round {i + 1} {mode}: {res}", file=sys.stderr)
    summary = {
        m: {
            q: {
                "min": min(v),
                "median": round(statistics.median(v), 3),
                "spread": round(max(v) - min(v), 3),
            }
            for q, v in per.items()
        }
        for m, per in samples.items()
    }
    out = {
        "metric": "simhash_tier_r9_vs_head_process_ab",
        "note": (
            "alternating fresh subprocesses (r9 worktree=d10e142 vs head), "
            "per-mode warmup, >=%d samples/mode/query at sf0.1; attributes "
            "the r10 cross-round medians (+16%%/+38%%) to code vs host"
            % ROUNDS
        ),
        "samples": samples,
        "order": order_log,
        "summary": summary,
    }
    path = os.path.join(HERE, "BENCH_SIMHASH_CODEAB.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Same-host rotating-order fresh-PROCESS A/B for the five relational
entries the r13 DRIVER filing regressed 1.8-2.7x canary-normalized
(q5_local_supplier_volume +126%, q15_top_supplier +169%,
left_join_order_counts +148%, text_tfidf_top_terms +106%,
similarity_anchor_topk_results +77%) while the builder's local
comparable was flat (-0.24%) and these entries' own code did not
change in round 13 (r13 VERDICT "What's wrong" #2).

Three modes isolate the one session-global round-13 change:
  r12         worktree at 9ec0c9c (the tree the r12 driver bench ran)
  head        current tree (ENGINE_CONFS UI-retention statics live)
  head_defret head code, retention statics reset to Spark defaults
              via pre-JVM extra_confs (the named suspect, isolated)

Outcomes: r12 ~= head ~= head_defret => the driver filing was host
noise (its canary spread was 0.671 on a 1.097 median). head > r12
with head_defret ~= r12 => the retention statics are code-guilty.

Protocol = BENCH_DEDUP_CODEAB.json's: order-rotated fresh
subprocesses, per-mode warmup of all queries, >=6 samples/mode/query
at sf0.1. Writes BENCH_RELATIONAL_CODEAB.json.
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
R12_SHA = "9ec0c9c"  # last round-12 commit (r13 range is 9ec0c9c..bf5d2fd)
# Spark's shipped defaults for the four retention confs ENGINE_CONFS
# bounds (session.py) — applied pre-JVM so they land as real statics.
DEFAULT_RETENTION = {
    "spark.sql.ui.retainedExecutions": "1000",
    "spark.ui.retainedJobs": "1000",
    "spark.ui.retainedStages": "1000",
    "spark.ui.retainedTasks": "100000",
}
MODES = {
    "r12": (os.path.join(HERE, ".ab_r12"), None),
    "head": (HERE, None),
    "head_defret": (HERE, DEFAULT_RETENTION),
}
QUERIES = [
    "q5_local_supplier_volume",
    "q15_top_supplier",
    "left_join_order_counts",
    "text_tfidf_top_terms",
    "similarity_anchor_topk_results",
]
ROUNDS = int(os.environ.get("AB_ROUNDS", "6"))

CHILD = r"""
import json, os, sys, time
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
from datasette_upload_csvs_spark.session import get_spark
import __spark_entry__ as entry
extra = os.environ.get("AB_EXTRA_CONFS")
spark = get_spark(
    app_name="relational_codeab",
    extra_confs=json.loads(extra) if extra else None,
)
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


def ensure_worktree() -> None:
    tree = MODES["r12"][0]
    if os.path.isdir(os.path.join(tree, "datasette_upload_csvs_spark")):
        return
    subprocess.run(
        ["git", "worktree", "add", "--detach", tree, R12_SHA],
        cwd=HERE, check=True,
    )


def run_child(tree: str, extra_confs: dict | None) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = tree
    env["AB_QUERIES"] = json.dumps(QUERIES)
    if extra_confs:
        env["AB_EXTRA_CONFS"] = json.dumps(extra_confs)
    else:
        env.pop("AB_EXTRA_CONFS", None)
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
    ensure_worktree()
    samples: dict[str, dict[str, list[float]]] = {
        m: {q: [] for q in QUERIES} for m in MODES
    }
    order_log = []
    for i in range(ROUNDS):
        modes = list(MODES.items())
        order = modes[i % len(modes):] + modes[:i % len(modes)]
        order_log.append([m for m, _ in order])
        for mode, (tree, extra) in order:
            res = run_child(tree, extra)
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
        "metric": "relational_r12_head_defret_process_ab",
        "note": (
            "rotating-order fresh subprocesses (r12=%s, head, "
            "head+default-retention), per-mode warmup, >=%d samples/"
            "mode/query at sf0.1. Attributes the r13 driver-filing "
            "regressions (q5 +126%%..q15 +169%% normalized, code "
            "unchanged) to host noise vs the ENGINE_CONFS "
            "UI-retention statics, per r13 VERDICT item 1"
            % (R12_SHA, ROUNDS)
        ),
        "samples": samples,
        "order": order_log,
        "summary": summary,
    }
    path = os.path.join(HERE, "BENCH_RELATIONAL_CODEAB.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Same-host alternating-PROCESS A/B: r10 code (8b4ae46, round-10
snapshot) vs head, for the four dedup-tier entries whose r11
cross-round mins moved (dedup_rate_by_source +46%, dedup_groups +42%,
dedup_minhash_lsh +29%, split_cluster_safe +25%) while the simhash
tier IMPROVED — the mixed signal round-11's VERDICT item 1(b) left
unattributed. git diff says the default dedup path is code-unchanged
in r11 (auto-cap and scratch_checkpoints are opt-in), so the
expectation is mode parity = host drift; this harness makes that an
artifact instead of an inference.

Protocol = BENCH_SIMHASH_CODEAB.json's (order-alternated fresh
subprocesses, per-mode warmup of all queries, >=6 samples/mode/query
at sf0.1). Writes BENCH_DEDUP_CODEAB.json.
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
R10_SHA = "8b4ae46"  # round-10 end-of-round snapshot
R11_SHA = "c092756"  # round-11 end-of-round snapshot
MODES = {
    "r10": os.path.join(HERE, ".ab_r10"),
    "r11": os.path.join(HERE, ".ab_r11"),
    "head": HERE,
}
SHAS = {".ab_r10": R10_SHA, ".ab_r11": R11_SHA}
QUERIES = [
    "dedup_groups",
    "split_cluster_safe",
    "dedup_rate_by_source",
    "dedup_minhash_lsh",
]
ROUNDS = int(os.environ.get("AB_ROUNDS", "6"))

CHILD = r"""
import json, os, sys, time
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
from datasette_upload_csvs_spark.session import get_spark
import __spark_entry__ as entry
spark = get_spark(app_name="dedup_codeab")
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


def ensure_worktrees() -> None:
    for tree in (MODES["r10"], MODES["r11"]):
        if os.path.isdir(os.path.join(tree, "datasette_upload_csvs_spark")):
            continue
        subprocess.run(
            ["git", "worktree", "add", "--detach", tree,
             SHAS[os.path.basename(tree)]],
            cwd=HERE, check=True,
        )


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
    ensure_worktrees()
    samples: dict[str, dict[str, list[float]]] = {
        m: {q: [] for q in QUERIES} for m in MODES
    }
    order_log = []
    for i in range(ROUNDS):
        # rotate which mode runs first each round so within-round
        # host drift is spread across all three modes
        modes = list(MODES.items())
        order = modes[i % len(modes):] + modes[:i % len(modes)]
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
        "metric": "dedup_tier_r10_r11_head_process_ab",
        "note": (
            "rotating-order fresh subprocesses (r10=%s, r11=%s, head), "
            "per-mode warmup, >=%d samples/mode/query at sf0.1. "
            "r10-vs-r11 attributes the r11 filed dedup-tier mins "
            "(+25..46%%) to code vs host (their default dedup path is "
            "git-identical, so parity = host drift); head adds the "
            "round-12 semi-join verify reduction on the same protocol"
            % (R10_SHA, R11_SHA, ROUNDS)
        ),
        "samples": samples,
        "order": order_log,
        "summary": summary,
    }
    path = os.path.join(HERE, "BENCH_DEDUP_CODEAB.json")
    # carry the first head measurement forward: the UNGATED semi-join
    # verify reduction regressed these entries +40..70% (head mode of
    # the first run) and motivated gating it on scratch_checkpoints —
    # keep that conviction data next to the post-gate rerun
    try:
        with open(path) as f:
            prior = json.load(f)
        if "summary" in prior:
            out["pre_fix"] = prior.get("pre_fix") or {
                "summary": prior["summary"],
                "note": "head = ungated semi-join verify (pre-gate)",
            }
    except (OSError, ValueError):
        pass
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

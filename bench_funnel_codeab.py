#!/usr/bin/env python
"""Same-host alternating-PROCESS A/B: curation_funnel_staged with
bucket_star_cap="auto" (the round-11 default) vs bucket_star_cap=None
(the r10 default), on the IDENTICAL sf0.1 corpus the registry entry
uses.

Round-11 VERDICT item 1(a): the entry's quiet-tier median moved
8.39 s -> 13.10 s the same round its default path changed to "auto",
but the builder's 128x A/B (BENCH_FUNNEL_SCALE.json, 576k docs)
showed auto ~= uncapped. Hypothesis to settle: at the sf0.1 entry's
~4.5k docs the auto cap's FIXED overhead (an extra stats aggregation
feeding a broadcast-exchange barrier per guarded join, serializing
the staged pipeline) dominates. This harness attributes code vs host
with the order-alternated protocol BENCH_SIMHASH_CODEAB.json proved
out:

  - modes = {auto, none}: SAME tree, cap threaded via env var into a
    direct run_curation_funnel call replaying the registry entry's
    exact inputs (pmod-10 doc/benchmark split, exact_floor_max_df=5)
  - ROUNDS alternating fresh subprocesses; WHICH MODE RUNS FIRST
    alternates per round (within-round host drift lands on the
    second child; alternation averages it out instead of letting it
    masquerade as a code delta)
  - each subprocess: fresh SparkSession local[32], one untimed
    warmup funnel, clearCache, one timed funnel

Writes BENCH_FUNNEL_CODEAB.json. Medians separated beyond their
spreads = the auto cap is code-guilty at small scale; overlapping =
host drift.
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
MODES = ["auto", "none"]
ROUNDS = int(os.environ.get("AB_ROUNDS", "6"))

CHILD = r"""
import json, os, time
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
from datasette_upload_csvs_spark.session import get_spark
from datasette_upload_csvs_spark.pipeline import run_curation_funnel
from datasette_upload_csvs_spark.queries import load, _FLOOR_MAX_DF
from pyspark.sql import functions as F

spark = get_spark(app_name="funnel_codeab")
spark.sparkContext.setLogLevel("ERROR")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cap = {"auto": "auto", "none": None}[os.environ["AB_CAP"]]

d = load(spark, sf, "documents")
docs = d.filter(F.pmod("doc_id", F.lit(10)) != 0)
bench = d.filter(F.pmod("doc_id", F.lit(10)) == 0)


def run():
    stages, split_s, shard_s = run_curation_funnel(
        docs, benchmark=bench, exact_floor_max_df=_FLOOR_MAX_DF,
        bucket_star_cap=cap,
    )
    # registry-entry parity: the staged counts ARE materialized by
    # run_curation_funnel itself; touch the summaries like the entry's
    # consumers would not (entry only reads stages), so timing covers
    # exactly what the quiet-tier bench times.
    return [(s.name, s.n_docs, s.n_tokens) for s in stages]


counts_warm = run()  # per-process warmup: codegen/Arrow/footers paid
spark.catalog.clearCache()
t0 = time.perf_counter()
counts = run()
el = time.perf_counter() - t0
print("ABRESULT " + json.dumps(
    {"elapsed": round(el, 3), "stage_counts": counts}))
"""


def run_child(mode: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = HERE
    env["AB_CAP"] = mode
    proc = subprocess.run(
        [sys.executable, "-c", CHILD], cwd=HERE, env=env,
        capture_output=True, text=True, timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"child mode={mode} produced no ABRESULT; stderr tail: "
        + proc.stderr[-2000:]
    )


def main() -> None:
    samples: dict[str, list[float]] = {m: [] for m in MODES}
    stage_counts: dict[str, list] = {}
    order_log = []
    for i in range(ROUNDS):
        order = list(MODES)
        if i % 2 == 1:
            order.reverse()
        order_log.append(order)
        for mode in order:
            res = run_child(mode)
            samples[mode].append(res["elapsed"])
            stage_counts[mode] = res["stage_counts"]
            print(f"# round {i + 1} {mode}: {res['elapsed']}s",
                  file=sys.stderr)
    summary = {
        m: {
            "min": min(v),
            "median": round(statistics.median(v), 3),
            "spread": round(max(v) - min(v), 3),
        }
        for m, v in samples.items()
    }
    # the auto cap's no-op contract: identical survivor counts
    counts_equal = stage_counts["auto"] == stage_counts["none"]
    out = {
        "metric": "funnel_staged_autocap_vs_none_process_ab",
        "note": (
            "alternating fresh subprocesses, same tree, cap via env; "
            "per-process warmup, %d samples/mode at sf0.1 replaying "
            "the registry entry's exact inputs; attributes the r11 "
            "quiet-tier +56%% to the auto-cap default vs host"
            % ROUNDS
        ),
        "samples": samples,
        "order": order_log,
        "summary": summary,
        "stage_counts_identical": counts_equal,
        "stage_counts": stage_counts,
    }
    path = os.path.join(HERE, "BENCH_FUNNEL_CODEAB.json")
    # keep the conviction run: if a prior artifact exists (the r11
    # in-graph auto-cap measurement that attributed the regression to
    # code), carry it forward under pre_fix so the fix's before/after
    # lives in one file
    try:
        with open(path) as f:
            prior = json.load(f)
        if "summary" in prior:
            out["pre_fix"] = prior.get("pre_fix") or {
                "summary": prior["summary"],
                "samples": prior["samples"],
                "note": "r11 in-graph broadcast auto-cap (pre-fix)",
            }
    except (OSError, ValueError):
        pass
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({"summary": summary,
                      "stage_counts_identical": counts_equal}))


if __name__ == "__main__":
    main()

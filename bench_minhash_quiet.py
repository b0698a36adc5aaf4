#!/usr/bin/env python
"""Quiet-host minhash-family bench (round-8 VERDICT item 2).

Runs the four minhash-pipeline headline queries at sf0.1 with extra
samples, from an idle host at the head commit, so the skew-collapse's
detection-aggregate premium is one clean measured number vs the r6
pre-collapse medians instead of an attribution argument.

Writes BENCH_MINHASH_QUIET.json: per-query min/median/spread over 5
timed samples (after 1 global + 1 per-query warmup), plus the r6
filed medians for the premium delta.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

FAMILY = [
    "dedup_minhash_lsh",
    "dedup_groups",
    "split_cluster_safe",
    "dedup_rate_by_source",
]

# r6 filed medians (BENCH_r06 era, pre-collapse) for the delta statement.
R6_MEDIANS = {
    "dedup_minhash_lsh": 1.64,
    "dedup_groups": 2.98,
    "split_cluster_safe": 3.33,
    "dedup_rate_by_source": 0.74,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    ).stdout.strip()

    from datasette_upload_csvs_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="bench_minhash_quiet")
    spark.sparkContext.setLogLevel("ERROR")
    registry = entry_mod.queries()

    for name in FAMILY:  # global warmup (codegen/footers)
        registry[name](spark, sf_dir).count()
    spark.catalog.clearCache()

    out: dict[str, dict] = {}
    for name in FAMILY:
        fn = registry[name]
        samples = []
        for i in range(6):  # sample 0 discarded per-query warmup
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            el = time.perf_counter() - t0
            if i > 0:
                samples.append(el)
            spark.catalog.clearCache()
        srt = sorted(samples)
        med = srt[len(srt) // 2]
        out[name] = {
            "min": round(srt[0], 3),
            "median": round(med, 3),
            "spread": round(srt[-1] - srt[0], 3),
            "r6_median": R6_MEDIANS[name],
            "delta_vs_r6": round(med - R6_MEDIANS[name], 3),
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)

    doc = {
        "metric": "minhash_family_quiet_host",
        "sf": 0.1,
        "commit": head,
        "samples_per_query": 5,
        "queries": out,
        "premium_total_sec": round(
            sum(v["delta_vs_r6"] for v in out.values()), 3
        ),
    }
    # BENCH_MINHASH_QUIET.json is the curated round-8 artifact (head
    # run + A/B + post-fix run + premium statement); raw re-runs land
    # next to it instead of clobbering it
    path = os.environ.get(
        "BENCH_MINHASH_QUIET_OUT",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "BENCH_MINHASH_QUIET_RUN.json",
        ),
    )
    with open(path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(doc))


if __name__ == "__main__":
    main()

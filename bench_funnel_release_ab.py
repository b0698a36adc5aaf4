#!/usr/bin/env python
"""A/B for the staged-funnel checkpoint-release fix (r14): replicate
bench.py's interleaved twin loop (1 discarded + 4 timed pairs,
alternating within-pair order) and print PER-PAIR walls, so the
monotone degradation the r14 baseline showed (capnone median 38.6 s
vs a 12.4 s first pair) is attributable to checkpoint litter vs
release. Also snapshots JVM heap + storage blocks per pair.

Writes BENCH_FUNNEL_RELEASE_AB.json (section = --section, default
"after").
"""
from __future__ import annotations

import json
import os
import sys
import time


def jvm_stats(spark) -> dict:
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    heap = mf.getMemoryMXBean().getHeapMemoryUsage()
    sc = spark.sparkContext._jsc.sc()
    rdds = sc.getRDDStorageInfo()
    return {
        "heap_used_mb": round(heap.getUsed() / 2**20),
        "cached_rdds": len(rdds),
        "cached_mb": round(
            sum(r.memSize() + r.diskSize() for r in rdds) / 2**20
        ),
    }


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    section = "after"
    if "--section" in sys.argv:
        section = sys.argv[sys.argv.index("--section") + 1]
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry
    from bench import _extra_queries
    from datasette_upload_csvs_spark.session import get_spark

    spark = get_spark(app_name="funnel-release-ab")
    spark.sparkContext.setLogLevel("ERROR")
    registry = {**entry.queries(), **_extra_queries()}
    pair = ("curation_funnel_staged", "curation_funnel_staged_capnone")

    walls: list[dict] = []
    for pair_i in range(5):  # pair 0 discarded (warmup)
        order = pair if pair_i % 2 == 0 else pair[::-1]
        row = {"pair": pair_i}
        for name in order:
            t0 = time.perf_counter()
            registry[name](spark, sf).count()
            row[name] = round(time.perf_counter() - t0, 3)
            spark.catalog.clearCache()
        row["jvm"] = jvm_stats(spark)
        walls.append(row)
        print(f"# {row}", file=sys.stderr)

    timed = walls[1:]
    out = {
        "sf": sf,
        "pairs": walls,
        "auto_min": min(r[pair[0]] for r in timed),
        "capnone_min": min(r[pair[1]] for r in timed),
        "auto_median": sorted(r[pair[0]] for r in timed)[len(timed) // 2],
        "capnone_median": sorted(r[pair[1]] for r in timed)[len(timed) // 2],
    }
    out["ratio_min"] = round(out["auto_min"] / out["capnone_min"], 3)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_FUNNEL_RELEASE_AB.json")
    try:
        with open(path) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        doc = {}
    doc[section] = out
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps({k: out[k] for k in (
        "auto_min", "capnone_min", "auto_median", "capnone_median",
        "ratio_min")}))


if __name__ == "__main__":
    main()

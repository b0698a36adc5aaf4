#!/usr/bin/env python
"""Attribute the warm-vs-bench gap on dedup_groups (r13 VERDICT item
5): warm best-of-3 in a dedicated session is 0.94 s at sf0.1, but the
bench filing's median is ~5 s — the headline now pays more for
SESSION AGING than for plans. Protocol: one fresh session;

  phase young   dedup_groups x4 (timed)  -> the dedicated-session number
  phase aging   the first ~20 headline queries, bench-style
                (count + clearCache), untimed
  phase old     dedup_groups x4 (timed)  -> the bench-context number

plus JVM GC time, heap, storage-block and shuffle-dep telemetry at
each phase boundary, so old/young > 1 comes with its mechanism:
GC-dominated (heap litter), block-manager litter (localCheckpoint
RDDs clearCache can't drop), or neither (scheduler/listener drag).
Writes BENCH_SESSION_AGE.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = 4
AGING_QUERIES = 20


def jvm_stats(spark) -> dict:
    """GC time/count + heap + live RDD block telemetry via py4j."""
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    gc_ms = 0
    gc_n = 0
    it = mf.getGarbageCollectorMXBeans().iterator()
    while it.hasNext():
        b = it.next()
        gc_ms += b.getCollectionTime()
        gc_n += b.getCollectionCount()
    heap = mf.getMemoryMXBean().getHeapMemoryUsage()
    sc = spark.sparkContext._jsc.sc()
    rdds = sc.getRDDStorageInfo()
    return {
        "gc_ms": gc_ms,
        "gc_count": gc_n,
        "heap_used_mb": round(heap.getUsed() / 2**20),
        "cached_rdds": len(rdds),
        "cached_mb": round(
            sum(r.memSize() + r.diskSize() for r in rdds) / 2**20
        ),
    }


def timed_block(registry, spark, name: str) -> list[float]:
    out = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        registry[name](spark, SF).count()
        out.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
    return out


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry
    from bench import HEADLINE
    from datasette_upload_csvs_spark.session import get_spark

    spark = get_spark(app_name="bench-session-age")
    spark.sparkContext.setLogLevel("ERROR")
    registry = entry.queries()

    # settle: one untimed dedup_groups pays codegen/footer caches
    registry["dedup_groups"](spark, SF).count()
    spark.catalog.clearCache()

    stats0 = jvm_stats(spark)
    young = timed_block(registry, spark, "dedup_groups")
    stats1 = jvm_stats(spark)
    print(f"# young: {young} {stats1}", file=sys.stderr)

    aged = [n for n in HEADLINE if n != "dedup_groups"][:AGING_QUERIES]
    t0 = time.perf_counter()
    for n in aged:
        try:
            registry[n](spark, SF).count()
        except Exception as ex:
            print(f"# aging {n} failed: {ex}", file=sys.stderr)
        spark.catalog.clearCache()
    aging_wall = round(time.perf_counter() - t0, 3)
    stats2 = jvm_stats(spark)
    print(f"# aged by {len(aged)} queries in {aging_wall}s: {stats2}",
          file=sys.stderr)

    old = timed_block(registry, spark, "dedup_groups")
    stats3 = jvm_stats(spark)
    print(f"# old: {old} {stats3}", file=sys.stderr)

    # forced driver GC: if 'old' recovers after this, the drag was
    # collectable litter (ContextCleaner backlog waiting on a GC)
    try:
        spark.sparkContext._jvm.System.gc()
        time.sleep(2)
    except Exception:
        pass
    post_gc = timed_block(registry, spark, "dedup_groups")
    stats4 = jvm_stats(spark)
    print(f"# post-gc: {post_gc} {stats4}", file=sys.stderr)

    out = {
        "metric": "dedup_groups_session_age",
        "sf": SF,
        "young": young,
        "old": old,
        "post_gc": post_gc,
        "aging_queries": len(aged),
        "aging_wall_s": aging_wall,
        "old_over_young_min": round(min(old) / min(young), 3),
        "postgc_over_young_min": round(min(post_gc) / min(young), 3),
        "jvm": {
            "before_young": stats0,
            "after_young": stats1,
            "after_aging": stats2,
            "after_old": stats3,
            "after_postgc": stats4,
        },
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_SESSION_AGE.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({k: out[k] for k in (
        "young", "old", "post_gc", "old_over_young_min",
        "postgc_over_young_min")}))


if __name__ == "__main__":
    main()

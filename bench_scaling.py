#!/usr/bin/env python
"""Core-scaling legs at a larger scale factor (r14 VERDICT item 3):
per-query wall of the 41 headline entries at $SPARK_GRAFT_CPUS over
$SPARK_GRAFT_SF_DIR, one discarded warmup + min-of-2 per query (the
scaling RATIO between core counts is the claim, so both legs run
this identical lightened protocol; bench.py's min-of-3/5 headline
protocol stays the trendline instrument at sf0.1).

Writes one JSON line to stdout; per-query lines to stderr.
Usage: SPARK_GRAFT_SF_DIR=/root/sf_synth/sf1.0 SPARK_GRAFT_CPUS=32 \
       python bench_scaling.py > BENCH_SCALING_SF1_c32.json
"""
from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/sf_synth/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    import bench as B
    import __spark_entry__ as entry_mod
    from datasette_upload_csvs_spark.session import get_spark

    spark = get_spark(app_name="bench-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    registry = {**entry_mod.queries(), **B._extra_queries()}

    canary = B._time_canary(spark)
    print(f"# canary: {canary}", file=sys.stderr, flush=True)

    timings: dict[str, float] = {}
    for name in B.HEADLINE:
        fn = registry[name]
        samples = []
        for i in range(3):  # sample 0 = discarded warmup
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            el = time.perf_counter() - t0
            if i > 0:
                samples.append(el)
        spark.catalog.clearCache()
        timings[name] = round(min(samples), 3)
        print(f"# {name}: min {min(samples):.3f}s", file=sys.stderr,
              flush=True)

    out = {
        "metric": "scaling_leg_wall_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf_dir": sf_dir,
        "cpus": int(cpus),
        "protocol": "warmup+min_of_2",
        "canary": canary,
        "queries": timings,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

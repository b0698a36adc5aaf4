#!/usr/bin/env python
"""Registry-wide plan audit: no entry may compile to a
CartesianProduct (the unbroadcast all-pairs failure). Exit 1 if any
does; BroadcastNestedLoopJoin occurrences are REPORTED but allowed —
they are the intentional broadcast-scalar / anchor-frame cross joins
(n×k map-side scoring, 1-row aggregate attachment), which are the
correct plan at any scale because the broadcast side is bounded.

Round-8 baseline: 231 entries checked, 0 CartesianProduct, 34
entries with legitimate BNLJ (see PLANS_r08.md §12).

Usage: python plan_audit.py [sf_dir]   (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from datasette_upload_csvs_spark import plans
    from datasette_upload_csvs_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    bad, bnlj, errs = [], [], []
    for name, fn in qs.items():
        try:
            p = plans.executed_plan(fn(spark, sf_dir))
        except Exception as ex:  # an unbuildable plan is a failure too
            errs.append((name, str(ex)[:120]))
            continue
        finally:
            spark.catalog.clearCache()
        if "CartesianProduct" in p:
            bad.append(name)
        elif "BroadcastNestedLoopJoin" in p:
            bnlj.append(name)
    print(f"checked={len(qs)} cartesian={len(bad)} "
          f"broadcast_nested_loop={len(bnlj)} errors={len(errs)}")
    for name in bad:
        print(f"CARTESIAN: {name}")
    for name, e in errs:
        print(f"ERROR: {name}: {e}")
    return 1 if bad or errs else 0


if __name__ == "__main__":
    raise SystemExit(main())

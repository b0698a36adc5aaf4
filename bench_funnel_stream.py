#!/usr/bin/env python
"""Per-epoch cost of the STREAMING curation funnel (round-10 VERDICT
item 3's bench leg): epochs carrying a recurring sub-threshold
template family arrive one after another, so the maintained band
index accumulates a dense family that grows with history. Uncapped,
each epoch's template docs join every historical family member in
their shared band buckets — per-epoch candidate mass grows ~linearly
with HISTORY (the failure a maintained index exists to avoid).
With bucket_star_cap="auto" (the funnel default) the history side
collapses to anchors and per-epoch cost is flat.

Per mode (uncapped / auto): E epochs of funnel_epoch are driven
directly (the foreachBatch body, timed individually — same protocol
as BENCH_STREAM_CAP), each epoch = U unique docs + K template-family
docs + a few exact dups; reports per-epoch wall seconds and pairs
rows written. The auto mode then runs the post-drain fold
(funnel_stream_stages) and reports its wall + staged counts — the
fold is metadata-scale, so its wall should be epoch-sized, not
corpus-sized.

Per-epoch rows carry `cand_pairs` — the distinct candidate count the
near-dup maintainer generated (rides the pairs write via Observation,
no extra job). On a SUB-threshold family verified pairs are 0 by
design; candidates are the quantity the cap bounds, and the uncapped
mode's candidates grow linearly with history while auto stays flat.

Usage: python bench_funnel_stream.py [E [K [U]]]   (default 8 1500 200)
Writes BENCH_FUNNEL_STREAM.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    e_total = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    k_fam = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
    u_unique = int(sys.argv[3]) if len(sys.argv) > 3 else 200

    from pyspark.sql import functions as F

    from datasette_upload_csvs_spark.session import get_spark
    from datasette_upload_csvs_spark.streaming.funnel_stream import (
        funnel_epoch,
        funnel_stream_stages,
        funnel_tables,
    )

    spark = get_spark(app_name="bench-funnel-stream")
    spark.sparkContext.setLogLevel("ERROR")

    stop = "the and for with that this from "
    tmpl = " ".join(f"tmpl{j}" for j in range(30))

    def epoch_docs(epoch: int):
        rows = []
        base = epoch * 10_000
        for i in range(k_fam):  # recurring sub-threshold family
            rows.append(
                (
                    base + i,
                    stop + tmpl + " "
                    + " ".join(f"u{j}x{base + i}" for j in range(12)),
                )
            )
        for i in range(u_unique):  # unique background
            rows.append(
                (
                    base + 1000 + i,
                    stop
                    + " ".join(f"v{j}w{base + i}" for j in range(20)),
                )
            )
        # a small exact-dup family per epoch (exact stage stays live)
        dup = stop + " ".join(f"dup{epoch}t{j}" for j in range(25))
        for i in range(5):
            rows.append((base + 5000 + i, dup))
        return spark.createDataFrame(rows, "doc_id long, text string")

    def drop_state(prefix):
        for t in funnel_tables(prefix):
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    results = {}
    for mode, cap in (("uncapped", None), ("auto", "auto")):
        prefix = f"bfs_{mode}"
        drop_state(prefix)
        per_epoch = []
        try:
            for ep in range(e_total):
                batch = epoch_docs(ep).localCheckpoint(eager=True)
                t0 = time.perf_counter()
                stats = funnel_epoch(
                    batch, ep, prefix, None, bucket_star_cap=cap
                )
                wall = time.perf_counter() - t0
                spark.catalog.refreshTable(f"{prefix}_pairs")
                pairs_ep = (
                    spark.table(f"{prefix}_pairs")
                    .filter(F.col("_batch_id") == ep)
                    .count()
                )
                per_epoch.append(
                    {"epoch": ep, "wall_s": round(wall, 3),
                     "cand_pairs": (stats or {}).get("cand_pairs"),
                     "pairs_written": pairs_ep}
                )
                print(
                    json.dumps({"mode": mode, **per_epoch[-1]}),
                    file=sys.stderr,
                )
                spark.catalog.clearCache()
            entry = {"per_epoch": per_epoch}
            if mode == "auto":
                t0 = time.perf_counter()
                res = funnel_stream_stages(spark, prefix)
                entry["fold_wall_s"] = round(time.perf_counter() - t0, 3)
                entry["stages"] = [
                    {"stage": n, "n_docs": d, "n_tokens": t}
                    for n, d, t in res.stages
                ]
            results[mode] = entry
        finally:
            drop_state(prefix)
            spark.catalog.clearCache()

    out = {
        "metric": "funnel_stream_epoch_cost",
        "epochs": e_total,
        "family_per_epoch": k_fam,
        "unique_per_epoch": u_unique,
        "results": results,
    }
    with open(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "BENCH_FUNNEL_STREAM.json",
        ),
        "w",
    ) as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

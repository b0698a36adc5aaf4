#!/usr/bin/env python
"""Streaming oversized-bucket guard bench: per-epoch cost of probing
a maintained fingerprint state that contains a K-member dense family
(wide_fp_stream), capped vs uncapped.

Uncapped, every batch doc that shares a chunk bucket with the family
joins all K members: per-epoch candidate mass grows linearly with
HISTORY (the thing a maintained index exists to avoid). With
bucket_star_cap the history side collapses oversized buckets to the
anchor, so the probe cost is flat in K. Semantics (components) are
pinned equal in tests/test_stream_bucket_cap.py; this artifact files
the wall/candidate separation.

Per K (history family size): build state via one bulk epoch
(untimed), then time ONE probe epoch (100 family + 400 unique docs)
capped=256 vs uncapped, reporting epoch wall and pairs written.

Usage: python bench_stream_cap.py [K...]  (default 2000 8000 32000)
Writes BENCH_STREAM_CAP.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    ks = [int(a) for a in sys.argv[1:]] or [2000, 8000, 32000]

    from pyspark.sql import functions as F

    from datasette_upload_csvs_spark.session import get_spark
    from datasette_upload_csvs_spark.streaming.wide_fp_stream import (
        wide_fp_epoch,
    )

    spark = get_spark(app_name="bench-stream-cap")
    spark.sparkContext.setLogLevel("ERROR")
    fam = " ".join(f"fam{j:02d}" for j in range(30))

    def docs(ids, family_ids):
        fset = set(family_ids)
        return spark.createDataFrame(
            [
                (
                    i,
                    fam
                    if i in fset
                    else " ".join(f"u{i}w{j}" for j in range(25)),
                )
                for i in ids
            ],
            "doc_id long, text string",
        )

    def drop(*ts):
        for t in ts:
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    results = []
    warmed = False
    for k in ks:
        hist_ids = list(range(k)) + list(range(500_000, 500_000 + k // 4))
        hist = docs(hist_ids, range(k)).localCheckpoint()
        probe = docs(
            list(range(700_000, 700_100)) + list(range(800_000, 800_400)),
            range(700_000, 700_100),
        ).localCheckpoint()
        row = {"k": k, "history_docs": len(hist_ids)}
        for cap, tag in ((None, "uncapped"), (256, "capped256")):
            pt, ft = f"bsc_{tag}_pairs", f"bsc_{tag}_fp"
            drop(pt, ft)
            wide_fp_epoch(hist, 0, pt, ft, bucket_star_cap=cap)
            if not warmed:
                wide_fp_epoch(probe, 1, pt, ft, bucket_star_cap=cap)
                spark.sql(
                    f"ALTER TABLE {pt} DROP PARTITION (_batch_id=1)"
                )
                spark.sql(
                    f"ALTER TABLE {ft} DROP PARTITION (_batch_id=1)"
                )
            t0 = time.perf_counter()
            wide_fp_epoch(probe, 1, pt, ft, bucket_star_cap=cap)
            el = time.perf_counter() - t0
            pairs = (
                spark.table(pt).filter(F.col("_batch_id") == 1).count()
            )
            row[f"{tag}_epoch_s"] = round(el, 3)
            row[f"{tag}_pairs"] = pairs
            drop(pt, ft)
            spark.catalog.clearCache()
        warmed = True
        results.append(row)
        print(json.dumps(row), file=sys.stderr)

    out = {"metric": "stream_bucket_cap", "results": results}
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_STREAM_CAP.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

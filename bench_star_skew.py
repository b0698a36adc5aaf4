#!/usr/bin/env python
"""Synthetic-skew bench for pair_mode=star (round-8 VERDICT item 1).

Plants ONE exact-duplicate group of K identical documents inside a
filler corpus and runs the full minhash_near_dup_pairs pipeline at
K in {10^3, 10^4, 10^5}:

- star mode at every K — output rows and wall must scale LINEARLY
  in K (the linearity claim);
- clique mode at the two smaller K only — its output is C(K,2)
  (5e9 rows at K=10^5: the clique is quadratic BY CONTRACT, which
  is exactly why cluster consumers route through star).

Writes BENCH_STAR_SKEW.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

K_VALUES = [1_000, 10_000, 100_000]
CLIQUE_MAX_K = 10_000  # C(K,2) output above this is pointless to materialize
FILLER = 20_000


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from datasette_upload_csvs_spark.session import get_spark
    from datasette_upload_csvs_spark.operators import dedup
    from pyspark.sql import functions as F

    spark = get_spark(app_name="bench_star_skew")
    spark.sparkContext.setLogLevel("ERROR")

    def corpus(k: int):
        dup = spark.range(k).select(
            F.col("id").alias("doc_id"),
            F.lit(
                "the quick brown fox jumps over the lazy dog again and "
                "again in the boilerplate footer of every mirrored page"
            ).alias("text"),
        )
        fill = spark.range(FILLER).select(
            (F.col("id") + 10_000_000).alias("doc_id"),
            F.concat(
                F.lit("unique document body "),
                F.col("id").cast("string"),
                F.lit(" with distinct words "),
                (F.col("id") * 7919).cast("string"),
                F.lit(" and trailing material "),
                (F.col("id") * 104729).cast("string"),
            ).alias("text"),
        )
        return dup.unionByName(fill).repartition(32, "doc_id").persist()

    rows = []
    for k in K_VALUES:
        docs = corpus(k)
        docs.count()  # materialize input outside the timed region
        for mode in ("star", "clique"):
            if mode == "clique" and k > CLIQUE_MAX_K:
                print(
                    f"# k={k} clique skipped: output is C(K,2) = "
                    f"{k * (k - 1) // 2} rows by contract",
                    file=sys.stderr,
                )
                continue
            t0 = time.perf_counter()
            n = dedup.minhash_near_dup_pairs(
                docs, threshold=0.7, pair_mode=mode
            ).count()
            wall = round(time.perf_counter() - t0, 3)
            spark.catalog.clearCache()
            docs.persist()
            docs.count()
            rows.append({"k": k, "mode": mode, "out_rows": n, "wall_sec": wall})
            print(f"# k={k} mode={mode}: rows={n} wall={wall}s", file=sys.stderr)
        docs.unpersist()

    doc = {
        "metric": "star_mode_skew_scaling",
        "filler_docs": FILLER,
        "rows": rows,
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_STAR_SKEW.json"
    )
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps(doc))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Alternating A/B for the BENCH_STAR_SKEW K=10^3 anomaly (round-8
VERDICT item 4): below the dup-mass gate (dup_extra = 999 < 1024)
star and clique both emit the FULL relation, so identical output
should cost identical wall. r8 filed star 7.23 s vs clique 2.63 s —
but star ran FIRST in a cold JVM. This script warms the JVM with one
untimed run of EACH mode, then alternates star/clique N times and
reports per-mode min/median. Appends an "ab_k1000" section to
BENCH_STAR_SKEW.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

K = 1_000
FILLER = 20_000
ROUNDS = 3  # timed samples per mode, alternating


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from datasette_upload_csvs_spark.session import get_spark
    from datasette_upload_csvs_spark.operators import dedup
    from pyspark.sql import functions as F

    spark = get_spark(app_name="bench_star_ab")
    spark.sparkContext.setLogLevel("ERROR")

    dup = spark.range(K).select(
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
    docs = dup.unionByName(fill).repartition(32, "doc_id").persist()
    docs.count()

    def run(mode: str) -> tuple[float, int]:
        t0 = time.perf_counter()
        n = dedup.minhash_near_dup_pairs(
            docs, threshold=0.7, pair_mode=mode
        ).count()
        el = time.perf_counter() - t0
        spark.catalog.clearCache()
        docs.persist()
        docs.count()
        return el, n

    # one untimed warmup per mode so neither pays cold-JVM codegen
    for mode in ("star", "clique"):
        el, n = run(mode)
        print(f"# warmup {mode}: {el:.3f}s rows={n}", file=sys.stderr)

    samples: dict[str, list[float]] = {"star": [], "clique": []}
    rows_out: dict[str, int] = {}
    for _ in range(ROUNDS):
        for mode in ("star", "clique"):
            el, n = run(mode)
            samples[mode].append(round(el, 3))
            rows_out[mode] = n
            print(f"# {mode}: {el:.3f}s rows={n}", file=sys.stderr)

    section = {
        "k": K,
        "note": (
            "alternating A/B after per-mode warmup; below the dup-mass "
            "gate both modes emit the full relation (identical output)"
        ),
        "rows_star": rows_out["star"],
        "rows_clique": rows_out["clique"],
        "star_samples": samples["star"],
        "clique_samples": samples["clique"],
        "star_min": min(samples["star"]),
        "clique_min": min(samples["clique"]),
        "star_median": sorted(samples["star"])[ROUNDS // 2],
        "clique_median": sorted(samples["clique"])[ROUNDS // 2],
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_STAR_SKEW.json"
    )
    doc = json.load(open(path)) if os.path.exists(path) else {}
    doc["ab_k1000"] = section
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps(section))


if __name__ == "__main__":
    main()

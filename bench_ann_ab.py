#!/usr/bin/env python
"""Alternating-process A/B for the ann_bands_recall r7→r8 regression
(round-8 VERDICT item 2). Variants:

  old — the r8 shape: the n_planted/max-id gate aggregate runs as a
        separate action straight off the parquet reader, and every
        downstream consumer (base, twins, the 4 band tables)
        re-reads the files.
  new — the r9 fix: base is localCheckpoint(eager=False)'d, so the
        gate aggregate's single scan materializes the blocks every
        later job reads (the registry entry as shipped).

Usage: python bench_ann_ab.py {old|new}  — one variant per PROCESS
(cross-round host drift made in-process sequencing untrustworthy in
r6–r8; the driver shell alternates processes). Each invocation does
1 discarded warmup + 2 timed runs and appends rows to
BENCH_ANN_AB.json.
"""

from __future__ import annotations

import json
import os
import sys
import time


def old_variant(spark, sf_dir):
    from datasette_upload_csvs_spark.queries import load
    from datasette_upload_csvs_spark.streaming.ann_stream import (
        embedding_ann_batch,
    )
    from pyspark.sql import functions as F

    base = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    st = base.agg(
        F.count("*").alias("n"),
        F.sum((F.pmod("vec_id", F.lit(5)) == 0).cast("long")).alias("p"),
        F.max("vec_id").alias("mx"),
    ).first()
    n_planted, off = int(st["p"] or 0), int(st["mx"]) + 1
    twins = base.filter(F.pmod("vec_id", F.lit(5)) == 0).select(
        (F.col("vec_id") + off).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x + F.when(i == 0, F.lit(0.001)).otherwise(F.lit(0.0)),
        ).cast("array<float>").alias("embedding"),
    )
    corpus = base.unionByName(twins)
    pairs = embedding_ann_batch(corpus, threshold=0.99)
    twin_pairs = pairs.filter(
        (F.col("id_b") >= off) & (F.col("id_a") == F.col("id_b") - off)
    )
    found = twin_pairs.count()
    return spark.createDataFrame(
        [(n_planted, found, found == n_planted)],
        schema="n_planted bigint, n_twin_pairs_found bigint, all_found boolean",
    )


def r7_variant(spark, sf_dir):
    # the r7 shape: closed-form planted count off a bare count() —
    # the cheapest possible gate, but silently wrong on
    # non-contiguous / 1-based id fixtures (why r8 replaced it).
    # Benched here only to attribute the r7→r8 delta on TODAY's host.
    from datasette_upload_csvs_spark.queries import load
    from datasette_upload_csvs_spark.streaming.ann_stream import (
        embedding_ann_batch,
    )
    from pyspark.sql import functions as F

    base = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = base.count()
    n_planted, off = (n + 4) // 5, n
    twins = base.filter(F.pmod("vec_id", F.lit(5)) == 0).select(
        (F.col("vec_id") + off).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x + F.when(i == 0, F.lit(0.001)).otherwise(F.lit(0.0)),
        ).cast("array<float>").alias("embedding"),
    )
    corpus = base.unionByName(twins)
    pairs = embedding_ann_batch(corpus, threshold=0.99)
    twin_pairs = pairs.filter(
        (F.col("id_b") >= off) & (F.col("id_a") == F.col("id_b") - off)
    )
    found = twin_pairs.count()
    return spark.createDataFrame(
        [(n_planted, found, found == n_planted)],
        schema="n_planted bigint, n_twin_pairs_found bigint, all_found boolean",
    )


def main() -> None:
    variant = sys.argv[1]
    assert variant in ("old", "new", "r7"), variant
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from datasette_upload_csvs_spark.session import get_spark
    from datasette_upload_csvs_spark import queries as qmod

    spark = get_spark(app_name=f"bench_ann_ab_{variant}")
    spark.sparkContext.setLogLevel("ERROR")

    def run() -> float:
        t0 = time.perf_counter()
        if variant == "old":
            df = old_variant(spark, sf_dir)
        elif variant == "r7":
            df = r7_variant(spark, sf_dir)
        else:
            df = qmod.ann_bands_recall(spark, sf_dir)
        n = df.count()
        el = time.perf_counter() - t0
        assert n == 1
        spark.catalog.clearCache()
        return el

    warm = run()
    print(f"# warmup {variant}: {warm:.3f}s", file=sys.stderr)
    samples = [round(run(), 3) for _ in range(2)]
    print(f"# {variant}: {samples}", file=sys.stderr)

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_ANN_AB.json"
    )
    doc = json.load(open(path)) if os.path.exists(path) else {
        "metric": "ann_bands_recall_ab",
        "note": (
            "alternating processes, 1 discarded warmup + 2 timed per "
            "process; old = r8 gate aggregate off the reader, new = "
            "r9 localCheckpoint'd base"
        ),
        "sf_dir": sf_dir,
        "rows": [],
    }
    doc["rows"].append({"variant": variant, "samples": samples})
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps({"variant": variant, "samples": samples}))


if __name__ == "__main__":
    main()

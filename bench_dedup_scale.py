#!/usr/bin/env python
"""Corpus-width scaling bench for the banded dedup/clustering tier
(round-7 VERDICT item 8).

dedup_groups and split_cluster_safe carry the repo's 100 TB claims
for the graph/clustering tier: banded MinHash candidates + df-capped
exact verify + pointer-jumping connected components — never
all-pairs. Those claims rested on plan shape; this script puts
numbers on them by widening the sf0.1 documents corpus synthetically
(every copy's tokens suffixed with the copy id, so copies share no
shingles and the per-copy df distribution is preserved — the same
widening trick bench_shingle_index.py uses) and measuring wall time
plus BYTES MOVED (shuffle-write + input read, via the Spark UI REST
API) at each width. The pass criterion: growth ≤ ~linear in corpus
size — a super-linear curve would mean an all-pairs or corpus²
exchange hiding in the pipeline.

Usage: python bench_dedup_scale.py [multipliers...] (default 1 8 32 128)
Prints one compact JSON line; per-width rows go to stderr and
BENCH_DEDUP_SCALE.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

QUERIES = ["dedup_groups", "split_cluster_safe"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    mults = [int(a) for a in sys.argv[1:]] or [1, 8, 32, 128]
    # SPARK_GRAFT_SCALE_QUERIES=dedup_groups limits one invocation to
    # a subset; SPARK_GRAFT_SCALE_WORK pins the corpus dir so a large
    # widened corpus is written once and shared across invocations
    # (rows merge into BENCH_DEDUP_SCALE.json either way).
    queries = [
        q
        for q in os.environ.get(
            "SPARK_GRAFT_SCALE_QUERIES", ",".join(QUERIES)
        ).split(",")
        if q
    ]
    work_env = os.environ.get("SPARK_GRAFT_SCALE_WORK")

    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from bench_shingle_index import _ShuffleMeter
    from datasette_upload_csvs_spark.session import get_spark

    spark = get_spark(
        app_name="bench-dedup-scale",
        # UI-REST shuffle meter: its measure window must out-live a
        # stage block, so undo ENGINE_CONFS' bounded stage retention
        extra_confs={"spark.ui.retainedStages": "20000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = entry_mod.queries()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base_n = docs.count()
    work = work_env or tempfile.mkdtemp(prefix="dedup-scale-")
    os.makedirs(work, exist_ok=True)

    results = []
    meter = None
    try:
        for m in mults:
            wdir = f"{work}/sf_x{m}"
            os.makedirs(wdir, exist_ok=True)
            corpus_path = f"{wdir}/documents.parquet"
            if not os.path.exists(f"{corpus_path}/_SUCCESS"):
                copies = [
                    docs.select(
                        (F.col("doc_id") + F.lit(i * 10 * base_n)).alias(
                            "doc_id"
                        ),
                        F.regexp_replace(
                            "text", r"(\S+)", rf"$1_m{i}"
                        ).alias("text"),
                        *[
                            c
                            for c in docs.columns
                            if c not in ("doc_id", "text")
                        ],
                    )
                    for i in range(m)
                ]
                corpus = copies[0]
                for c in copies[1:]:
                    corpus = corpus.unionByName(c)
                corpus.write.mode("overwrite").parquet(corpus_path)

            for qname in queries:
                fn = registry[qname]

                def run():
                    n = fn(spark, wdir).count()
                    spark.catalog.clearCache()
                    return n

                if meter is None:  # one untimed JVM/codegen warmup
                    run()
                    meter = _ShuffleMeter(spark)

                # wall: min over runs (2 at small widths, 1 at large
                # — a 128x run is minutes; the bytes tell the story)
                walls = []
                t0 = time.perf_counter()
                shuf, inp, n_rows = meter.measure(run)
                walls.append(time.perf_counter() - t0)
                if m < 32:
                    t0 = time.perf_counter()
                    run()
                    walls.append(time.perf_counter() - t0)
                row = {
                    "query": qname,
                    "mult": m,
                    "corpus_docs": base_n * m,
                    "wall_s": round(min(walls), 3),
                    "shuffle_mb": round(shuf / 2**20, 2),
                    "input_mb": round(inp / 2**20, 2),
                    "rows": n_rows,
                }
                results.append(row)
                print(f"# {row}", file=sys.stderr)
            if work_env is None:
                shutil.rmtree(wdir, ignore_errors=True)
    finally:
        if work_env is None:
            shutil.rmtree(work, ignore_errors=True)

    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "BENCH_DEDUP_SCALE.json",
    )
    # merge with prior invocations (large multipliers are run as
    # separate processes so one run stays within a driver timeout):
    # same (query, mult, base_docs) replaces, new rows append
    merged = {}
    if os.path.exists(detail_path):
        try:
            with open(detail_path) as f:
                prior = json.load(f)
            if prior.get("base_docs") == base_n:
                for r in prior.get("rows", []):
                    merged[(r["query"], r["mult"])] = r
        except (OSError, ValueError):
            pass
    for r in results:
        merged[(r["query"], r["mult"])] = r
    out = {
        "metric": "dedup_scale_width",
        "unit": "sec",
        "base_docs": base_n,
        "rows": sorted(
            merged.values(), key=lambda r: (r["query"], r["mult"])
        ),
    }
    with open(detail_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()

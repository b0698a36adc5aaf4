#!/usr/bin/env python
"""Shingle-index crossover bench (round-5 verdict item 6).

The maintained ShingleIndex claims BATCH-linear text work per append
where the one-shot capped path (dedup.ngram_jaccard_pairs with
restrict_to_ids) re-reads and re-shingles the WHOLE corpus per call.
At sf0.1 (5k docs) the one-shot path wins locally because corpus
re-shingling is sub-second — this script widens the corpus
synthetically (every copy's tokens suffixed with the copy id, so
copies share no shingles and the df distribution is preserved per
copy) and measures both paths per append as the corpus grows, to
show the crossover the structural claim predicts.

Per multiplier M (corpus = M x sf0.1 documents, written to parquet
first so both paths pay identical read costs):

  one_shot  — ngram_jaccard_pairs(corpus + batch, restrict_to_ids=
              batch).count(): the full re-shingle recompute.
  idx_query — ShingleIndex.edges_for_batch(batch).count(): edge
              query against the committed index.
  idx_app   — ShingleIndex.append(batch): index maintenance
              (shingles the batch once, writes 3 partitions).

Timing protocol: one full untimed warmup of both paths at the
smallest multiplier (JVM/codegen/footer caches), then min-of-3 per
measurement. The batch is half exact-dups of corpus docs (so the
edge pipeline runs end-to-end with real candidates, edges > 0) and
half disjoint-token docs.

Usage: python bench_shingle_index.py [multipliers...]  (default 4 16 64)
Prints one JSON line: {"metric": "shingle_index_crossover", ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def _best_of(k, fn):
    best = None
    for _ in range(k):
        t0 = time.perf_counter()
        out = fn()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    return best, out


class _ShuffleMeter:
    """Sum shuffle-write bytes + input-read bytes over the stages a
    code block executed, via the local Spark UI REST API. local[32]
    makes shuffles nearly free in wall time (memory-backed, no
    network), so the scale-honest comparison between the one-shot
    recompute and the maintained index is BYTES MOVED: a corpus-wide
    exchange stays corpus-linear forever, while the index path's
    exchanges are batch-scale."""

    def __init__(self, spark):
        import urllib.request

        self._url = spark.sparkContext.uiWebUrl
        self._req = urllib.request
        app = json.loads(
            self._req.urlopen(f"{self._url}/api/v1/applications").read()
        )
        self._app_id = app[0]["id"]

    def _stages(self):
        data = json.loads(
            self._req.urlopen(
                f"{self._url}/api/v1/applications/{self._app_id}/stages"
                "?status=complete"
            ).read()
        )
        return {
            (s["stageId"], s["attemptId"]): (
                s.get("shuffleWriteBytes", 0),
                s.get("inputBytes", 0),
            )
            for s in data
        }

    def measure(self, fn):
        before = self._stages()
        out = fn()
        after = self._stages()
        new = [v for k, v in after.items() if k not in before]
        evicted = [k for k in before if k not in after]
        if evicted:
            import sys as _sys

            print(
                f"WARN _ShuffleMeter: {len(evicted)} stages evicted "
                "from the UI store during the measured block — "
                "shuffle/input bytes undercounted (raise "
                "spark.ui.retainedStages on a FRESH session)",
                file=_sys.stderr,
            )
        return (
            sum(v[0] for v in new),
            sum(v[1] for v in new),
            out,
        )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    mults = [int(a) for a in sys.argv[1:]] or [4, 16, 64]

    from pyspark.sql import functions as F

    from datasette_upload_csvs_spark.operators import dedup
    from datasette_upload_csvs_spark.operators.shingle_index import ShingleIndex
    from datasette_upload_csvs_spark.session import get_spark

    spark = get_spark(
        app_name="bench-shingle-index",
        # UI-REST shuffle meter: its measure window must out-live a
        # stage block, so undo ENGINE_CONFS' bounded stage retention
        extra_confs={"spark.ui.retainedStages": "20000"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    base_n = docs.count()
    work = tempfile.mkdtemp(prefix="shix-bench-")

    # the append batch: 100 EXACT dups of copy-0 corpus docs (fresh
    # ids — the edge pipeline finds jaccard=1.0 pairs, so candidate
    # expansion + verify run on real work) + 100 disjoint-token docs
    batch = (
        docs.limit(100)
        .select(
            (F.col("doc_id") + F.lit(10**9)).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", r"$1_m0").alias("text"),
        )
        .unionByName(
            docs.limit(100).select(
                (F.col("doc_id") + F.lit(2 * 10**9)).alias("doc_id"),
                F.regexp_replace("text", r"(\S+)", r"$1_zb").alias("text"),
            )
        )
    )
    batch_path = f"{work}/batch"
    batch.write.parquet(batch_path)

    results = []
    warmed = False
    try:
        for m in mults:
            corpus_path = f"{work}/corpus_{m}"
            copies = [
                docs.select(
                    (F.col("doc_id") + F.lit(i * 10 * base_n)).alias(
                        "doc_id"
                    ),
                    F.regexp_replace(
                        "text", r"(\S+)", rf"$1_m{i}"
                    ).alias("text"),
                )
                for i in range(m)
            ]
            corpus = copies[0]
            for c in copies[1:]:
                corpus = corpus.unionByName(c)
            corpus.write.parquet(corpus_path)

            corpus_pq = spark.read.parquet(corpus_path)
            batch_pq = spark.read.parquet(batch_path)

            def run_oneshot():
                n = dedup.ngram_jaccard_pairs(
                    corpus_pq.unionByName(batch_pq),
                    threshold=0.7,
                    max_df=20,
                    restrict_to_ids=batch_pq.select("doc_id"),
                ).count()
                spark.catalog.clearCache()
                return n

            # --- maintained index: build (untimed — amortized over
            # the corpus's own ingest batches), then query + append
            idx = ShingleIndex(spark, f"shix_bench_{m}")
            idx.drop()
            idx.append(corpus_pq, batch=0)

            def run_idx_query():
                n = idx.edges_for_batch(
                    batch_pq, threshold=0.7, max_df=20
                ).count()
                spark.catalog.clearCache()
                return n

            if not warmed:  # JVM/codegen/footer warmup, untimed
                run_oneshot()
                run_idx_query()
                warmed = True
                meter = _ShuffleMeter(spark)

            one_shot, n_oneshot = _best_of(2, run_oneshot)
            os_shuf, os_in, _ = meter.measure(run_oneshot)
            idx_query, n_idx = _best_of(2, run_idx_query)
            ix_shuf, ix_in, _ = meter.measure(run_idx_query)

            # append timed once per batch id (idempotent overwrite
            # makes retries same-shaped; one measurement suffices —
            # it is the cheap leg)
            t0 = time.perf_counter()
            idx.append(batch_pq, batch=1)
            idx_app = time.perf_counter() - t0

            idx.drop()
            assert n_oneshot == n_idx, (m, n_oneshot, n_idx)
            row = {
                "mult": m,
                "corpus_docs": base_n * m,
                "one_shot_s": round(one_shot, 3),
                "idx_query_s": round(idx_query, 3),
                "idx_append_s": round(idx_app, 3),
                "idx_total_s": round(idx_query + idx_app, 3),
                "one_shot_shuffle_mb": round(os_shuf / 2**20, 2),
                "idx_query_shuffle_mb": round(ix_shuf / 2**20, 2),
                "one_shot_input_mb": round(os_in / 2**20, 2),
                "idx_query_input_mb": round(ix_in / 2**20, 2),
                "edges": n_idx,
            }
            results.append(row)
            print(f"# {row}", file=sys.stderr)
            shutil.rmtree(corpus_path, ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "shingle_index_crossover",
                "unit": "sec",
                "batch_docs": 200,
                "rows": results,
            }
        )
    )


if __name__ == "__main__":
    main()

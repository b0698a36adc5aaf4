#!/usr/bin/env python
"""Corpus-width scaling bench for the embedding/vector tier.

The dedup/graph tier's 100 TB claims got their numbers in
bench_dedup_scale.py; this script does the same for the vector tier:

- ann_bands_recall — the multi-table LSH band pipeline behind
  streaming/ann_stream.py (bucketing map-only, candidates join on
  (table, bucket), exact verify over candidates only). Claim:
  batch-proportional work, never corpus².
- semdedup_prune_arrow — the PRODUCTION SemDeDup path (k = max(32,
  ceil(sqrt(n))) quantizer, Arrow matmul assignment, cluster-bounded
  pairwise). Claim: quadratic-work fraction Σ bucket²/n² falls as
  the corpus grows, so realized work is ~O(n^1.5) worst-case.
- semdedup_prune — the interpreted-expression twin, benched at SMALL
  widths only: its per-row higher-order-function cosines are the
  ~0.3 ms/row ceiling PLANS_r06 §5c measured, which is exactly why
  the Arrow twin exists. Benching both makes the gap a filed number
  at width, not prose.

Widening trick: every copy applies a SIGNED PERMUTATION (cyclic
shift by copy-id + murmur3 sign pattern) to the base vectors — an
orthogonal transform, so within-copy pairwise structure (clusters,
neighbors, planted-twin cosines) is preserved exactly, while
cross-copy cosines are ~N(0, 1/sqrt(dim)) noise that never crosses
the 0.99 ANN threshold. vec_ids are offset per copy, so the
smallest-id quantizer anchors stay in copy 0 and the k=sqrt(n) rule
sees ONE corpus, not m independent ones.

Usage: python bench_vector_scale.py [multipliers...] (default 1 8 32 128)
Prints one compact JSON line; per-width rows go to stderr and
BENCH_VECTOR_SCALE.json (same merge semantics as bench_dedup_scale).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

# query -> max multiplier it runs at (the expression semdedup is
# capped: interpreted HOF cosines at 64k+ vectors are the documented
# ceiling the Arrow twin replaces; see PLANS_r06 §5c)
QUERIES = {
    "ann_bands_recall": 128,
    # 512 (2.56 M vectors): the round-8 chunked-broadcast quantizer
    # ceiling check — k=ceil(sqrt(n))=1600 anchors, shuffle must stay
    # corpus-linear
    "semdedup_prune_arrow": 512,
    "semdedup_prune": 8,
}


def widened_copy(vecs, i: int, dim: int, base_n: int):
    """Copy ``i`` of the base vector frame under a signed permutation
    (cyclic shift by i + murmur3 sign pattern): an orthogonal
    transform, so within-copy pairwise cosine structure is preserved
    (up to fp summation order) while cross-copy cosines are
    ~N(0, 1/sqrt(dim)) sign-noise. Copy 0 is the base frame itself.
    tests/test_vector_widening.py pins both properties."""
    from pyspark.sql import functions as F

    if i == 0:
        return vecs
    shifted = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.element_at(
            "embedding", F.pmod(j + F.lit(i), F.lit(dim)) + 1
        )
        * F.when(
            F.pmod(F.hash(j, F.lit(i)), F.lit(2)) == 0,
            F.lit(1.0),
        ).otherwise(F.lit(-1.0)),
    ).cast("array<float>")
    return vecs.select(
        (F.col("vec_id") + F.lit(i * 10 * base_n)).alias("vec_id"),
        shifted.alias("embedding"),
        *[c for c in vecs.columns if c not in ("vec_id", "embedding")],
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    mults = [int(a) for a in sys.argv[1:]] or [1, 8, 32, 128]
    queries = {
        q: QUERIES[q]
        for q in os.environ.get(
            "SPARK_GRAFT_SCALE_QUERIES", ",".join(QUERIES)
        ).split(",")
        if q
    }
    work_env = os.environ.get("SPARK_GRAFT_SCALE_WORK")

    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from bench_shingle_index import _ShuffleMeter
    from datasette_upload_csvs_spark.session import get_spark

    spark = get_spark(
        app_name="bench-vector-scale",
        # UI-REST shuffle meter: its measure window must out-live a
        # stage block, so undo ENGINE_CONFS' bounded stage retention
        extra_confs={"spark.ui.retainedStages": "20000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = entry_mod.queries()

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base_n = vecs.count()
    dim = len(vecs.select("embedding").first()[0])
    work = work_env or tempfile.mkdtemp(prefix="vector-scale-")
    os.makedirs(work, exist_ok=True)

    results = []
    meter = None
    try:
        for m in mults:
            wdir = f"{work}/sf_x{m}"
            os.makedirs(wdir, exist_ok=True)
            corpus_path = f"{wdir}/embeddings.parquet"
            if not os.path.exists(f"{corpus_path}/_SUCCESS"):
                copies = [
                    widened_copy(vecs, i, dim, base_n) for i in range(m)
                ]
                corpus = copies[0]
                for c in copies[1:]:
                    corpus = corpus.unionByName(c)
                corpus.write.mode("overwrite").parquet(corpus_path)

            for qname, qmax in queries.items():
                if m > qmax:
                    continue
                fn = registry[qname]
                verdicts = []

                def run():
                    df = fn(spark, wdir)
                    if qname == "ann_bands_recall":
                        # 1-row verdict frame: keep the recall gate's
                        # all_found so the filed rows prove widening
                        # preserved the planted-twin structure
                        rows = df.collect()
                        verdicts.append(bool(rows[0]["all_found"]))
                        n = len(rows)
                    else:
                        n = df.count()
                    spark.catalog.clearCache()
                    return n

                if meter is None:  # one untimed JVM/codegen warmup
                    run()
                    meter = _ShuffleMeter(spark)

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
                    "corpus_vecs": base_n * m,
                    "wall_s": round(min(walls), 3),
                    "shuffle_mb": round(shuf / 2**20, 2),
                    "input_mb": round(inp / 2**20, 2),
                    "rows": n_rows,
                }
                if verdicts:
                    row["all_found"] = all(verdicts)
                results.append(row)
                print(f"# {row}", file=sys.stderr)
            if work_env is None:
                shutil.rmtree(wdir, ignore_errors=True)
    finally:
        if work_env is None:
            shutil.rmtree(work, ignore_errors=True)

    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "BENCH_VECTOR_SCALE.json",
    )
    merged = {}
    if os.path.exists(detail_path):
        try:
            with open(detail_path) as f:
                prior = json.load(f)
            if prior.get("base_vecs") == base_n:
                for r in prior.get("rows", []):
                    merged[(r["query"], r["mult"])] = r
        except (OSError, ValueError):
            pass
    for r in results:
        merged[(r["query"], r["mult"])] = r
    out = {
        "metric": "vector_scale_width",
        "unit": "sec",
        "base_vecs": base_n,
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

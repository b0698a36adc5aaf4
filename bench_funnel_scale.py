#!/usr/bin/env python
"""Composed-funnel scale bench (round-9 verdict item 1).

Per-component scale benches (BENCH_DEDUP_SCALE, BENCH_VECTOR_SCALE,
BENCH_FP_SCALE) cannot see a hidden per-stage corpus re-scan — the
bug class where each stage of a lazily-composed pipeline re-derives
its input from the parquet scan, turning a linear pipeline into
O(stages × corpus). This bench runs the FULL curation funnel
(pipeline.run_curation_funnel: scan → Gopher quality → exact dedup →
near-dup groups (star MinHash + CC) → 8-gram decontamination →
cluster-safe split → balanced-shard export) as one staged job graph
over a synthetically widened corpus and records, PER STAGE, wall
seconds + shuffle-write bytes + input-read bytes from the Spark UI
REST API (the bench_shingle_index.py pattern).

Corpus widening: M copies of the sf documents table with every
NON-STOPWORD token suffixed by a fixed-width 2-letter per-copy tag,
so copies share no content shingles/grams and the per-copy dup/
near-dup/contamination structure is preserved — corpus mass scales
by M while density stays fixed. Two funnel-specific twists on the
BENCH_DEDUP_SCALE recipe: stopwords stay UNSUFFIXED (the Gopher
stage's >=2-stop-hits rule must keep firing — a naive all-token suffix
zeroes the stop hits and the quality stage drops the whole corpus),
and the tag is the SAME length for every copy (mean-word-length is a
Gopher band, so the pass set must be identical per copy and per M).
The benchmark side is the doc_id%10==0 slice of the SAME widened
corpus (written to its own parquet), the funnel corpus is the %10!=0
slice, so contamination mass also scales by M.

Linearity claims this artifact pins:
  * total funnel wall grows ~linearly in M (no quadratic stage);
  * per-stage input bytes grow ~linearly — in particular the `scan`
    stage's input is the ONLY corpus-parquet read (later stages read
    checkpointed RDD blocks, which the REST API reports as no
    file input);
  * shuffle bytes grow ~linearly (bucketed candidates, no all-pairs).

Timing protocol: one full untimed funnel at the smallest multiplier
warms JVM/codegen/footer caches; each multiplier then runs the
funnel ONCE (stages are internally min-of-1 — the funnel is too
stateful to best-of-N per stage, and the cross-M trend, not the
per-point noise, is the claim).

At the second-largest multiplier (128x) the funnel also runs TWO
more passes on the near-dup stage: bucket_star_cap=256 (hand-tuned,
the r10 protocol) and bucket_star_cap="auto" (the in-graph pair-mass
forecast, now the funnel default) — the A/B quantifies what the cap
buys inside the composed pipeline AND that auto tracks hand-tuned
(round-10 VERDICT item 4). Round 11 adds the >=5M-doc decade
(multiplier 1280, run with the engine's DEFAULT auto cap — the
uncapped pass at 5M docs is the quadratic-spill regime the cap
exists to avoid, and a first attempt ran the host out of disk) to
pin that the 128x broadcast→exchange regime flip is a step, not a
slope (round-10 VERDICT item 6).

Usage: python bench_funnel_scale.py [multipliers...]
(default 1 8 32 128 1280)
Prints one JSON line and writes BENCH_FUNNEL_SCALE.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


class _ShuffleMeter:
    """Shuffle-write + input-read bytes over the stages a block ran
    (local Spark UI REST). local[32] makes shuffles nearly free in
    wall time, so BYTES MOVED is the scale-honest per-stage metric."""

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
        # Retention eviction check: spark.ui.retainedStages is a core
        # conf — setting it on an already-active session is silently
        # ineffective, so verify the window actually out-lived the
        # block. A 'before' stage missing from 'after' means the UI
        # store evicted stages mid-measurement and the byte sums
        # undercount.
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
        return sum(v[0] for v in new), sum(v[1] for v in new), out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    mults = [int(a) for a in sys.argv[1:]] or [1, 8, 32, 128, 1280]

    from pyspark.sql import functions as F

    from datasette_upload_csvs_spark.pipeline import run_curation_funnel
    from datasette_upload_csvs_spark.session import get_spark

    # zstd shuffle blocks: the 5M-doc decade's near-dup stage keeps
    # every intermediate shuffle on disk for the life of its one job
    # (normal Spark — scratch scales with cluster nodes; this bench
    # host has ONE disk), and lz4'd shingle-array shuffles overran an
    # 80 GB scratch partition. zstd compresses these long-array
    # blocks ~2-3x tighter for a few % CPU; walls are reported under
    # the same codec at every multiplier, so the trendline is
    # self-consistent.
    # periodicGC 30s: ContextCleaner only deletes a released shuffle's
    # files after a DRIVER GC collects its ShuffleDependency, and the
    # default periodic GC (30 min) outlives a whole decade-scale
    # funnel stage — garbage identified by the lineage cuts (CC's
    # checkpointed adjacency, released stage frames) must actually be
    # collected WHILE the stage runs or it accumulates to disk-full.
    spark = get_spark(
        app_name="bench-funnel-scale",
        extra_confs={
            "spark.io.compression.codec": "zstd",
            "spark.cleaner.periodicGC.interval": "30s",
            # UI-REST shuffle meter: its measure window must out-live
            # a stage block (the decade near-dup stage spans hundreds
            # of Spark stages), so undo ENGINE_CONFS' bounded stage
            # retention for this metered bench
            "spark.ui.retainedStages": "20000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    meter = _ShuffleMeter(spark)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    base_n = docs.count()
    work = tempfile.mkdtemp(prefix="funnel-bench-")

    from datasette_upload_csvs_spark.functions.text import STOPWORDS

    # suffix every non-stopword token with a 2-letter per-copy tag:
    # (^|\s) anchors token starts, the negative lookahead skips exact
    # stopword tokens (so Gopher's stop-hit rule keeps firing), and
    # the fixed tag width keeps mean-word-length — another Gopher
    # band — identical across copies and multipliers.
    stop_alt = "|".join(STOPWORDS)
    token_pat = rf"(^|\s)(?!(?:{stop_alt})(?:\s|$))(\S+)"

    # 52-letter tag alphabet: 52^2 = 2704 distinct fixed-width tags,
    # enough for the >=5M-doc decade (1280 copies); the 26-letter
    # scheme capped out at 676. Stopword matching is unaffected (the
    # lookahead tests the ORIGINAL token), tag width stays 3 chars.
    _ALPHA = (
        "abcdefghijklmnopqrstuvwxyz" "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    )

    def widen(m):
        copies = [
            docs.select(
                (F.col("doc_id") + F.lit(i * 10 * base_n)).alias("doc_id"),
                F.regexp_replace(
                    "text",
                    token_pat,
                    rf"$1$2_{_ALPHA[i // 52]}{_ALPHA[i % 52]}",
                ).alias("text"),
            )
            for i in range(m)
        ]
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        return out

    results = []
    warmed = False
    try:
        for m in mults:
            # partitions sized to the data, as a cluster would: 32
            # partitions at 4M+ docs force multi-pass sort spills
            # (each shuffle partition's sort outgrows its share of
            # execution memory and rewrites itself to disk several
            # times); AQE coalesces the small stages back down, so
            # the only cost at small multipliers is scheduler noise
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(256 if m >= 320 else 32),
            )
            corpus_path = f"{work}/corpus_{m}"
            bench_path = f"{work}/bench_{m}"
            wide = widen(m)
            wide.filter(F.pmod("doc_id", F.lit(10)) != 0).write.parquet(
                corpus_path
            )
            wide.filter(F.pmod("doc_id", F.lit(10)) == 0).write.parquet(
                bench_path
            )

            def run_funnel(collect_rows, cap=None):
                rows = {}

                def run_stage(name, thunk):
                    t0 = time.perf_counter()
                    shuf, inp, stage = meter.measure(thunk)
                    el = time.perf_counter() - t0
                    if collect_rows:
                        rows[name] = {
                            "wall_s": round(el, 3),
                            "shuffle_mb": round(shuf / 2**20, 2),
                            "input_mb": round(inp / 2**20, 2),
                            "n_docs": stage.n_docs,
                            "n_tokens": stage.n_tokens,
                        }
                        # live progress: a died run still tells us
                        # which stage it was in and what it cost
                        print(
                            json.dumps({"stage": name, **rows[name]}),
                            file=sys.stderr,
                        )
                    return stage

                stages, split_summary, shards = run_curation_funnel(
                    spark.read.parquet(corpus_path),
                    benchmark=spark.read.parquet(bench_path),
                    bucket_star_cap=cap,
                    run_stage=run_stage,
                    # peak block storage = two adjacent stages, not
                    # #stages corpus copies — the 5M-doc point ran
                    # the host out of disk without this
                    release_stage_frames=True,
                )
                split_summary.collect()
                spark.catalog.clearCache()
                return rows

            if not warmed:  # JVM/codegen/footer warmup, untimed
                run_funnel(collect_rows=False)
                warmed = True

            # the >=5M-doc decade point runs the engine's DEFAULT
            # configuration (bucket_star_cap="auto") only: the
            # uncapped pass at 5M docs is exactly the quadratic-spill
            # regime the cap exists to avoid (a first attempt ran the
            # host out of shuffle-spill disk), and the capped-vs-
            # uncapped attribution is filed at 128x where both fit
            main_cap = "auto" if m >= 1000 else None
            t0 = time.perf_counter()
            rows = run_funnel(collect_rows=True, cap=main_cap)
            total = time.perf_counter() - t0

            row = {
                "mult": m,
                "main_cap": main_cap,
                "corpus_docs": rows["scan"]["n_docs"],
                "total_wall_s": round(total, 3),
                "wall_ms_per_kdoc": round(
                    1000.0 * total / max(rows["scan"]["n_docs"] / 1000, 1e-9),
                    2,
                ),
                "total_shuffle_mb": round(
                    sum(r["shuffle_mb"] for r in rows.values()), 2
                ),
                "corpus_file_input_mb": rows["scan"]["input_mb"],
                "stages": rows,
            }
            if m == (mults[-2] if len(mults) >= 2 else mults[-1]):
                # capped A/B at the largest multipliers: quantify the
                # oversized-bucket guard inside the composed pipeline,
                # hand-tuned (256, the r10 protocol) vs "auto" (the
                # in-graph forecast that is now run_curation_funnel's
                # default — round-10 VERDICT item 4 asks auto ≈ hand)
                for key, cap in (("capped256", 256), ("auto_cap", "auto")):
                    t0 = time.perf_counter()
                    capped_rows = run_funnel(collect_rows=True, cap=cap)
                    row[key] = {
                        "total_wall_s": round(time.perf_counter() - t0, 3),
                        "near_dup_wall_s": capped_rows["near_dup_groups"][
                            "wall_s"
                        ],
                        "near_dup_shuffle_mb": capped_rows["near_dup_groups"][
                            "shuffle_mb"
                        ],
                        "survivors": capped_rows["near_dup_groups"]["n_docs"],
                    }
            results.append(row)
            # this multiplier's corpus is never read again — free its
            # scratch before the next (10x larger) corpus lands
            shutil.rmtree(corpus_path, ignore_errors=True)
            shutil.rmtree(bench_path, ignore_errors=True)
            print(json.dumps({"progress": row["mult"],
                              "wall": row["total_wall_s"]}),
                  file=sys.stderr)
            shutil.rmtree(corpus_path, ignore_errors=True)
            shutil.rmtree(bench_path, ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_FUNNEL_SCALE.json")
    # merge by multiplier: a partial rerun (e.g. `128 1280` after a
    # code change) replaces only the re-measured rows and keeps the
    # rest of the curve, so the filed artifact stays the full sweep
    prior_rows = {}
    try:
        with open(path) as f:
            prior = json.load(f)
        prior_rows = {r["mult"]: r for r in prior.get("results", [])}
    except (OSError, ValueError, KeyError):
        pass
    for r in results:
        prior_rows[r["mult"]] = r
    out = {
        "metric": "funnel_scale",
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "base_docs": base_n,
        "stage_order": [
            "scan", "gopher_quality", "exact_dedup", "near_dup_groups",
            "decontaminated", "cluster_safe_split", "export_shards",
        ],
        "results": [prior_rows[m] for m in sorted(prior_rows)],
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

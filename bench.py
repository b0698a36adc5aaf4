#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE compact JSON line (guaranteed to fit the driver's ~2 kB
stdout-tail capture regardless of how many queries are benched):
  {"metric": ..., "value": N, "unit": "sec", "sf": ..., "n_queries": M,
   "detail": "BENCH_DETAIL.json"}

value = total wall time of the headline query set (each timed over
`count()`-style full materialization). Per-query min/median/spread go
to BENCH_DETAIL.json next to this script (and a '#'-prefixed stderr
line) — round 6's single-line map outgrew the tail capture and filed
"parsed": null.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_change",
    "left_join_order_counts",
    "window_running_total",
    "rollup_nation_priority",
    "events_session_window",
    "events_funnel",
    "dedup_minhash_lsh",
    "similarity_topk_bruteforce",
    "similarity_topk_batch",
    "text_word_freq",
    "multimodal_feature_extract",
    # ≥3-shuffle analytics tier: multi-exchange plans whose exchanges
    # are algorithmic stages — regressions here are invisible to the
    # 0/1-shuffle queries above
    "text_tfidf_top_terms",
    "events_weekly_retention",
    "q15_top_supplier",
    "similarity_anchor_topk_results",
    # curation tier (round 4): the pretraining-pipeline passes —
    # a double explode/agg join (repetition) and the distributed
    # two-phase prefix sum (packing)
    "curation_repetition_stats",
    "curation_pack_chunks",
    # expensive dedup/graph tier (round 5): the 5-8-shuffle pipelines
    # a real 100 TB curation run executes end-to-end — capped-edge
    # clustering, the cluster-keyed split, and the per-source
    # MinHash redundancy audit. These were the costliest unbenched
    # workloads; the cap's cost/benefit is measured here.
    "dedup_groups",
    "split_cluster_safe",
    "dedup_rate_by_source",
    # capped-exact representative: one shingle exchange, map-side
    # pair expansion, exact verify over ~1M candidates
    "dedup_containment",
    # published-method curation tier (late round 5): benchmark
    # decontamination (broadcast gram screen), SemDeDup semantic
    # pruning, DSIR top-k selection, and the map-only Gopher
    # doc-quality ruleset — the remaining pipeline families a 100 TB
    # run executes that were not yet measured
    "decontaminate_exact_ngram",
    "semdedup_prune",
    "dsir_resample_topk",
    "gopher_quality_filters",
    # round-6 corpus-scale additions: SoftDedup commonness weights
    # (the TF-IDF-shaped gram df/join/agg pipeline) and the D4
    # prototype-pruning leg (quantizer assignment + cluster window)
    "softdedup_commonness_weights",
    "d4_prototype_prune",
    # round-6 linear-algebra + diversity tier: one Lloyd iteration
    # (broadcast centroids, single corpus scan), one power-iteration
    # step (dimension-keyed aggregate), and the triple-n n-gram
    # type/token ratio (heaviest explode fan-out in the registry)
    "kmeans_lloyd_step",
    "embedding_pca_power_iteration",
    "ngram_diversity_by_source",
    # the banded candidate pipeline behind the embedding ANN stream,
    # run end-to-end (plant twins → bucket 4 tables → verify) with
    # its exact-recall gate
    "ann_bands_recall",
    # round-7 Arrow production twins: same oracles as their
    # expression entries, numpy-matmul execution — benching BOTH
    # paths keeps the interpreted-vs-Arrow gap visible per round
    "semdedup_prune_arrow",
    "kmeans_lloyd_step_arrow",
    # round-8 multimodal tier: perceptual hashing over binary
    # payloads (Arrow pass) and the binary near-dup pipeline
    # (planted twins + generalized pigeonhole chunk join)
    "multimodal_phash_fingerprints",
    "multimodal_near_dup_pairs",
    # round-8 heavy additions: ExactSubstr surgery (two window
    # shuffles + per-doc span join) and CC over the portable-SimHash
    # pigeonhole tier
    "dedup_exact_substr_removed",
    "simhash_dup_groups",
    # round-9: the 128-bit scale-regime tier (4x32-bit pigeonhole
    # keys; BENCH_FP_SCALE.json for the width-scaling law)
    "simhash128_dup_groups",
]

# Timed with the same protocol but NOT in the headline total (filed
# under "quiet" in BENCH_DETAIL.json): entries that would double-
# charge headline operators in the total (round-9 verdict's hygiene
# note). simhash_dup_groups_fast is the xxhash64 hot-path twin of
# simhash_dup_groups — what an engine-internal pass runs (one JVM
# hash/token vs 8 hex parses); bench-only because xxhash64 isn't
# reproducible in DuckDB so no oracle is possible (exact-dup
# containment pinned in tests/test_fp_wide.py). curation_funnel_staged
# COMPOSES headline operators (gopher -> exact dedup -> minhash+CC ->
# decontam) with per-stage materialization — benching it quietly
# gives a per-round composition trendline without re-charging its
# components in the headline.
QUIET = [
    "simhash_dup_groups_fast",
    "curation_funnel_staged",
    # round-13 (r12 VERDICT item 4): the bucket_star_cap=None twin of
    # curation_funnel_staged, same corpus/split — the auto-cap's
    # no-op-regime premium becomes a per-round trendline
    # (BENCH_FUNNEL_CODEAB measured it once at +10.3% median; the
    # detail sidecar files it as auto_cap_premium). Bench-only: the
    # cap setting is an execution knob, not a different query, so a
    # second registry entry would be oracle-duplicating noise.
    "curation_funnel_staged_capnone",
]

# Queries whose r7/r8 filed spreads rivaled their medians (up to
# 6.9 s on a loaded host): 5 timed samples instead of 3, so the
# median is trustworthy and regression calls stop re-litigating host
# noise (round-8 VERDICT item 8).
NOISY = frozenset({
    "dedup_minhash_lsh", "split_cluster_safe", "dedup_groups",
    "dedup_rate_by_source", "dsir_resample_topk", "simhash_dup_groups",
    "simhash_dup_groups_fast", "simhash128_dup_groups",
})

# bench-only twins: no DuckDB oracle is possible (engine-internal
# hash sources), so they live here rather than in the registry —
# the registry keeps its every-entry-oracle-backed invariant.
def _extra_queries():
    from datasette_upload_csvs_spark.queries import _simhash_dup_groups_impl

    def _funnel_staged_capnone(spark, sf):
        from pyspark.sql import functions as F

        from datasette_upload_csvs_spark.pipeline import (
            run_curation_funnel,
        )
        from datasette_upload_csvs_spark.queries import (
            _FLOOR_MAX_DF,
            load,
        )

        d = load(spark, sf, "documents")
        # release_stage_frames mirrors the registry twin: without it
        # each twin invocation leaks ~6 corpus-sized checkpoint
        # frames (clearCache can't drop them) and the interleaved
        # loop degrades monotonically (r14: capnone median 38.6 s vs
        # a 12.4 s first pair).
        stages, _, _ = run_curation_funnel(
            d.filter(F.pmod("doc_id", F.lit(10)) != 0),
            benchmark=d.filter(F.pmod("doc_id", F.lit(10)) == 0),
            exact_floor_max_df=_FLOOR_MAX_DF,
            bucket_star_cap=None,
            release_stage_frames=True,
        )
        return spark.createDataFrame(
            [(s.name, s.n_docs) for s in stages],
            "stage string, n_docs bigint",
        )

    return {
        "simhash_dup_groups_fast": (
            lambda spark, sf: _simhash_dup_groups_impl(
                spark, sf, portable=False
            )
        ),
        "curation_funnel_staged_capnone": _funnel_staged_capnone,
    }


def _canary_df(spark):
    """Host-speed canary: a fixed CPU-bound, IO-free plan (seeded
    synthetic agg over spark.range — xxhash64 + trig into a 1024-key
    partial agg, pure whole-stage codegen, zero file scans, zero
    shuffled bytes beyond 1024 rows). Its wall time tracks the HOST
    (CPU clock, scheduler, thermal state), not the repo: any
    cross-round move in the canary is drift, and the comparable
    block is additionally reported canary-normalized so plan
    regressions stop costing a full attribution round-trip
    (round-11 VERDICT item 2 — r9→r10 simhash and r10→r11 dedup
    each burned one)."""
    from pyspark.sql import functions as F

    return (
        spark.range(0, 512_000_000, 1, 32)
        .select(
            F.xxhash64("id").alias("h"),
            F.sin(F.col("id").cast("double") * 1e-7).alias("s"),
        )
        .groupBy(F.pmod("h", F.lit(1024)).alias("k"))
        .agg(F.sum("s").alias("ss"), F.sum(F.xxhash64("h")).alias("sh"))
    )


def _time_canary(spark) -> dict:
    """One discarded warmup + 5 timed runs of the canary; min is the
    host-speed number (same steady-state protocol as the queries)."""
    samples = []
    for i in range(6):
        t0 = time.perf_counter()
        _canary_df(spark).count()
        el = time.perf_counter() - t0
        if i > 0:
            samples.append(el)
    srt = sorted(samples)
    return {
        "min": round(srt[0], 3),
        "median": round(srt[len(srt) // 2], 3),
        "spread": round(srt[-1] - srt[0], 3),
    }


def _load_prev_detail(detail_path: str) -> dict:
    """Previous round's per-query numbers, read BEFORE this run
    overwrites the sidecar. Used for the comparable_prev_total field:
    the sum over the INTERSECTION of headline sets, so a tier move
    (adding/retiring/quieting a query) can never flatter the one-number
    trendline (round-10 VERDICT item 2 — the r10 headline "looked"
    -7% only because the set shrank; same-set it was +9%)."""
    try:
        with open(detail_path) as f:
            prev = json.load(f)
        if isinstance(prev.get("queries"), dict):
            return prev
    except (OSError, ValueError):
        pass
    return {}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    from datasette_upload_csvs_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = {**entry_mod.queries(), **_extra_queries()}

    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    prev_detail = _load_prev_detail(detail_path)

    # Host-speed canary FIRST — a fixed point in every round's run,
    # before any query has touched caches or block storage.
    canary = _time_canary(spark)
    print(f"# canary: {canary}", file=sys.stderr)

    # Warm-up: one untimed pass of every headline query at the target
    # SF so JVM/codegen/Arrow compilation and file-footer caches are
    # paid before timing. Reported numbers are steady-state execution
    # — the regime that matters for a long-lived cluster.
    for name in HEADLINE + QUIET:
        try:
            registry[name](spark, sf_dir).count()
        except Exception as ex:  # warm-up must never fail the bench
            print(f"# warmup {name} failed: {ex}", file=sys.stderr)
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    spreads: dict[str, float] = {}
    quiet: dict[str, dict] = {}
    # The auto-cap twins are measured INTERLEAVED (below), not as two
    # sequential blocks: the r13 driver filing's premium (1.161) vs
    # the local one (1.081) showed the sequential protocol lets ~40 s
    # of host drift between the auto block and the capnone block
    # masquerade as a cap premium (r13 VERDICT item 3).
    _TWIN_PAIR = ("curation_funnel_staged", "curation_funnel_staged_capnone")
    for name in HEADLINE + QUIET:
        if name in _TWIN_PAIR:
            continue
        fn = registry[name]
        # min of 3 timed runs after one discarded per-query warmup
        # (on top of the global warmup pass above); SUB-1s queries
        # get min of 5 — their round-5 spreads (up to 2.0 s on a
        # loaded host) were comparable to the numbers themselves, so
        # two extra samples buy a far more trustworthy min at
        # negligible wall cost. The min is the steady-state number;
        # max-min is reported as the spread so a plan regression is
        # distinguishable from host jitter.
        samples, n = [], 0
        i, budget = 0, (6 if name in NOISY else 4)
        while i < budget:
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()  # full pipeline materialization
            el = time.perf_counter() - t0
            if i > 0:  # sample 0 is the discarded warmup
                samples.append(el)
                if len(samples) == 1 and el < 1.0:
                    budget = 6  # sub-1s tier: 5 timed samples
            i += 1
        # drop persisted frames a query left behind (e.g. minhash's
        # signature cache): accumulated blocks inflate GC for every
        # later query and make run N slower than run 1.
        spark.catalog.clearCache()
        srt = sorted(samples)
        if name in QUIET:
            quiet[name] = {
                "min": round(srt[0], 3),
                "median": round(srt[len(srt) // 2], 3),
                "spread": round(srt[-1] - srt[0], 3),
            }
        else:
            timings[name] = round(srt[0], 3)
            medians[name] = round(srt[len(srt) // 2], 3)
            spreads[name] = round(srt[-1] - srt[0], 3)
        print(
            f"# {name}: min {srt[0]:.3f}s "
            f"median {srt[len(srt) // 2]:.3f}s "
            f"(+{srt[-1] - srt[0]:.3f} spread) rows={n}"
            + (" [quiet]" if name in QUIET else ""),
            file=sys.stderr,
        )

    # Interleaved twin measurement: one discarded warmup pair, then 4
    # timed pairs with the within-pair order alternating (A,B),(B,A),
    # ... so neither mode systematically runs first and slow host
    # drift lands on both modes equally. Per-mode min is the
    # steady-state number; the min-ratio is the premium claim.
    twin_samples: dict[str, list[float]] = {n: [] for n in _TWIN_PAIR}
    for pair_i in range(5):  # pair 0 discarded
        order = _TWIN_PAIR if pair_i % 2 == 0 else _TWIN_PAIR[::-1]
        for name in order:
            t0 = time.perf_counter()
            registry[name](spark, sf_dir).count()
            el = time.perf_counter() - t0
            spark.catalog.clearCache()
            if pair_i > 0:
                twin_samples[name].append(el)
    for name in _TWIN_PAIR:
        srt = sorted(twin_samples[name])
        quiet[name] = {
            "min": round(srt[0], 3),
            "median": round(srt[len(srt) // 2], 3),
            "spread": round(srt[-1] - srt[0], 3),
        }
        print(
            f"# {name}: min {srt[0]:.3f}s "
            f"median {srt[len(srt) // 2]:.3f}s "
            f"(+{srt[-1] - srt[0]:.3f} spread) [quiet, interleaved]",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Same-set comparison vs the previous filed detail (see
    # _load_prev_detail). prev/now are sums of per-query MINs over the
    # common name set; only comparable when the sf matches.
    comparable = {"n_common": 0, "prev": None, "now": None}
    prev_q = prev_detail.get("queries", {})
    if prev_detail.get("sf") == sf_val:
        common = sorted(set(prev_q) & set(timings))
        if common:
            comparable = {
                "n_common": len(common),
                "prev": round(sum(prev_q[q] for q in common), 3),
                "now": round(sum(timings[q] for q in common), 3),
            }
            # canary-normalized same-set comparison: scale `now` by
            # prev_canary/now_canary so uniform host drift cancels.
            # A normalized delta that persists is a plan/code change;
            # a raw delta that normalizes away is the host.
            prev_canary = (prev_detail.get("canary") or {}).get("min")
            if prev_canary and canary["min"]:
                comparable["canary_prev"] = prev_canary
                comparable["canary_now"] = canary["min"]
                comparable["now_normalized"] = round(
                    comparable["now"] * prev_canary / canary["min"], 3
                )
    # Per-query detail (min + median + spread) goes to a sidecar file:
    # the driver captures only the ~2 kB tail of stdout, and at 34+
    # headline queries a single line carrying the full per-query map
    # outgrew that window in round 6 ("parsed": null). The final stdout
    # line is kept compact and parseable regardless of registry growth.
    detail = {
        "metric": "headline_query_wall_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "median": medians,
        "spread": spreads,
        "quiet": quiet,
        "canary": canary,
        "sf": sf_val,
        "comparable": comparable,
    }
    # the auto-cap no-op-regime premium trendline (r12 VERDICT item
    # 4): staged funnel, auto vs cap=None, same corpus, same run
    if (
        "curation_funnel_staged" in quiet
        and "curation_funnel_staged_capnone" in quiet
    ):
        a = quiet["curation_funnel_staged"]["median"]
        b = quiet["curation_funnel_staged_capnone"]["median"]
        am = quiet["curation_funnel_staged"]["min"]
        bm = quiet["curation_funnel_staged_capnone"]["min"]
        detail["auto_cap_premium"] = {
            "auto_median": a,
            "capnone_median": b,
            "ratio": round(a / b, 3) if b else None,
            # steady-state premium from interleaved per-mode mins —
            # the number the <=1.10 bar is judged on now that the
            # twins alternate within pairs (median ratio kept for
            # cross-round continuity with r13's filing)
            "auto_min": am,
            "capnone_min": bm,
            "ratio_min": round(am / bm, 3) if bm else None,
            "protocol": "interleaved_pairs_alternating_order_4x",
        }
    try:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError as ex:
        print(f"# could not write {detail_path}: {ex}", file=sys.stderr)
    print("# detail: " + json.dumps(detail), file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_total",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "comparable_prev_total": comparable["prev"],
                "comparable_now_total": comparable["now"],
                "comparable_now_normalized": comparable.get(
                    "now_normalized"
                ),
                "comparable_n": comparable["n_common"],
                "canary_sec": canary["min"],
                "detail": "BENCH_DETAIL.json",
            }
        )
    )


if __name__ == "__main__":
    main()

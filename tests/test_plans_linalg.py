"""Plan pins for the round-6 linear-algebra / corpus-statistics
entries: single corpus scan, broadcast benchmark/centroid frames,
pre-shuffle window limits — the shapes PLANS_r06.md §5b claims."""

from __future__ import annotations

from datasette_upload_csvs_spark import plans
from datasette_upload_csvs_spark import queries as Q


def _scan_count(plan: str, token: str) -> int:
    return sum(
        1
        for line in plan.splitlines()
        if "FileScan parquet" in line and token in line
    )


def test_kmeans_step_single_corpus_scan(spark, sf_dir):
    df = Q.kmeans_lloyd_step(spark, sf_dir)
    plan = plans.executed_plan(df)
    # exactly two embedding scans: the corpus and the 8-row seed probe
    assert _scan_count(plan, "embeddings") == 2, plan
    assert "BroadcastNestedLoopJoin" in plan  # centroids broadcast
    assert "WindowGroupLimit" in plan  # argmin folded pre-shuffle


def test_power_iteration_single_corpus_scan(spark, sf_dir):
    df = Q.embedding_pca_power_iteration(spark, sf_dir)
    df.collect()  # resolve the lazy checkpoint
    plan = plans.executed_plan(df)
    # the checkpointed w replaces every re-derivation of the scan
    assert _scan_count(plan, "embeddings") == 0, plan
    assert "Scan ExistingRDD" in plan


def test_unigram_kl_single_corpus_scan(spark, sf_dir):
    df = Q.unigram_kl_by_source(spark, sf_dir)
    df.collect()
    plan = plans.executed_plan(df)
    # four consumers of cnt, ONE documents scan (zero after the
    # checkpoint resolves)
    assert _scan_count(plan, "documents") <= 1, plan


def test_semantic_decontamination_map_only(spark, sf_dir):
    df = Q.semantic_decontamination(spark, sf_dir)
    plan = plans.executed_plan(df)
    # corpus scan + two tiny benchmark probes, all joins broadcast,
    # and the ONLY exchange is the label rollup (plus AQE coalesce)
    assert "SortMergeJoin" not in plan
    hash_exchanges = [
        line
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line
    ]
    assert len(hash_exchanges) == 1, hash_exchanges
    assert "label" in hash_exchanges[0]


def test_zipf_rank_limit_before_exchange(spark, sf_dir):
    df = Q.zipf_slope_by_source(spark, sf_dir)
    plan = plans.executed_plan(df)
    # the top-500 rank cut runs as a partial WindowGroupLimit on the
    # map side, so the source-keyed shuffle carries ≤500 rows/source
    assert plan.count("WindowGroupLimit") >= 2, plan
    assert _scan_count(plan, "documents") == 1, plan


def test_ngram_diversity_single_scan(spark, sf_dir):
    df = Q.ngram_diversity_by_source(spark, sf_dir)
    plan = plans.executed_plan(df)
    assert _scan_count(plan, "documents") == 1, plan
    # grams are built in codegen: no join anywhere in the plan
    assert "Join" not in plan, plan

"""Plan-shape regression tests: the 100 TB contract.

Correctness says the answer is right; these say the *plan* is the one
that survives a 1000-executor cluster: pushdown at the scan, pruned
read schemas, broadcast dimensions, codegen on the hot path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datasette_upload_csvs_spark import plans
from datasette_upload_csvs_spark import queries as Q


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    l = Q.load(spark, sf_dir, "lineitem")
    df = l.filter(F.col("l_orderkey") == 42).select("l_orderkey", "l_quantity")
    assert plans.has_pushed_filters(df)


def test_projection_prunes_read_schema(spark, sf_dir):
    l = Q.load(spark, sf_dir, "lineitem")
    df = l.select("l_orderkey", "l_quantity")
    cols = plans.read_schema_columns(df)
    assert set(cols) == {"l_orderkey", "l_quantity"}, cols


def test_q1_prunes_unused_columns(spark, sf_dir):
    df = Q.q1_pricing_summary(spark, sf_dir)
    cols = plans.read_schema_columns(df)
    # 16-column table; Q1 needs exactly these 7
    assert set(cols) == {
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_shipdate",
    }, cols


def test_q1_shipdate_filter_pushed(spark, sf_dir):
    assert plans.has_pushed_filters(Q.q1_pricing_summary(spark, sf_dir))


def test_q5_broadcasts_dimensions(spark, sf_dir):
    assert plans.uses_broadcast_join(Q.q5_local_supplier_volume(spark, sf_dir))


def test_q3_broadcasts_customer(spark, sf_dir):
    assert plans.uses_broadcast_join(Q.q3_shipping_priority(spark, sf_dir))


def test_q1_wholestage_codegen(spark, sf_dir):
    assert plans.wholestage_codegen_spans(Q.q1_pricing_summary(spark, sf_dir)) >= 1


def test_q1_single_shuffle(spark, sf_dir):
    # scan → partial agg → ONE exchange on the group keys → final agg
    # (the orderBy-less Q1 needs exactly one shuffle)
    assert plans.shuffle_count(Q.q1_pricing_summary(spark, sf_dir)) == 1


def test_similarity_topk_no_shuffle_on_corpus(spark, sf_dir):
    # broadcast of the single query row + TakeOrderedAndProject means
    # the corpus itself is never exchanged
    from datasette_upload_csvs_spark.operators import similarity

    df = similarity.brute_force_topk(
        Q.load(spark, sf_dir, "embeddings"), query_id=0, k=10
    )
    plan = plans.formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert plans.uses_broadcast_join(df)


def test_q17_broadcasts_part_and_pushes_brand(spark, sf_dir):
    df = Q.q17_small_quantity_revenue(spark, sf_dir)
    assert plans.uses_broadcast_join(df)
    assert plans.has_pushed_filters(df)


def test_q19_or_predicates_push_to_both_scans(spark, sf_dir):
    df = Q.q19_disjunctive_revenue(spark, sf_dir)
    assert plans.uses_broadcast_join(df)
    txt = df._jdf.queryExecution().executedPlan().toString()
    # per-side OR conjuncts extracted and pushed (not a nested loop)
    assert "BroadcastNestedLoopJoin" not in txt
    assert plans.shuffle_count(df) <= 1


def test_similarity_batch_broadcasts_queries(spark, sf_dir):
    df = Q.similarity_topk_batch(spark, sf_dir)
    txt = df._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in txt  # 8-row query side, never the corpus


def test_sample_is_map_side_only(spark, sf_dir):
    from datasette_upload_csvs_spark.operators import sampling
    from datasette_upload_csvs_spark.sources.parquet import read_table

    df = sampling.deterministic_sample(
        read_table(spark, sf_dir, "orders"), "o_orderkey", 0.1
    )
    assert plans.shuffle_count(df) == 0


def test_pii_redact_query_is_map_only(spark, sf_dir):
    df = Q.curation_pii_redact(spark, sf_dir)
    assert plans.shuffle_count(df) == 0
    assert plans.wholestage_codegen_spans(df) >= 1


def test_bloom_screen_broadcasts_filter(spark, sf_dir):
    df = Q.bloom_contamination_screen(spark, sf_dir)
    txt = plans.executed_plan(df)
    # the position set reaches the train side as a broadcast, and the
    # train scan never shuffles its documents
    assert "BroadcastExchange" in txt
    assert set(plans.read_schema_columns(df)) <= {"doc_id", "source", "text"}


def test_cms_sketch_is_single_aggregation(spark, sf_dir):
    df = Q.cms_token_heavy_hitters(spark, sf_dir)
    txt = plans.executed_plan(df)
    # counter build + truth + probe join — but no nested-loop blowup
    assert "BroadcastNestedLoopJoin" not in txt


def test_ks_binned_window_is_bounded(spark, sf_dir):
    # the CDF window runs over <=100 bin rows, so the plan's only
    # SinglePartition exchange carries the bin table, not lineitem
    df = Q.ks_price_returnflag_binned(spark, sf_dir)
    txt = plans.executed_plan(df)
    assert txt.count("Exchange SinglePartition") <= 2
    assert set(plans.read_schema_columns(df)) == {
        "l_returnflag", "l_extendedprice",
    }


def test_q16_anti_join_and_part_pushdown(spark, sf_dir):
    df = Q.q16_parts_supplier_count(spark, sf_dir)
    txt = plans.executed_plan(df)
    assert "LeftAnti" in txt
    assert plans.has_pushed_filters(df)


def test_balanced_shards_no_global_data_window(spark, sf_dir):
    df = Q.export_balanced_shards(spark, sf_dir)
    txt = plans.executed_plan(df)
    # band-prefix pattern: the single-partition window covers one row
    # per distinct size, never the doc stream
    assert txt.count("Exchange SinglePartition") <= 2
    assert plans.uses_broadcast_join(df)


def test_cluster_edge_generation_is_banded(spark, sf_dir):
    """dedup_groups' edge source must stay the MinHash band pipeline:
    no full-data Window (the capped path's df count-window would show
    one), no string shingles (xxhash64 on token slots only), and the
    pre-closure plan must contain the band-bucket join keyed on the
    (band, slice) struct — the sub-quadratic candidate property."""
    from datasette_upload_csvs_spark.operators import dedup
    from datasette_upload_csvs_spark.sources.parquet import read_table

    pairs = dedup.minhash_near_dup_pairs(
        read_table(spark, sf_dir, "documents"), threshold=0.7
    )
    txt = plans.executed_plan(pairs)
    assert "xxhash64" in txt
    assert "array_join" not in txt  # shingle strings never built
    assert "Window" not in txt      # no df count-window on this path
    pairs.unpersist()
    spark.catalog.clearCache()


def test_capped_jaccard_single_shingle_shuffle(spark, sf_dir):
    """The capped exact path must pay exactly ONE shingle-keyed
    exchange: the df count-window caps hot shingles (counts only, no
    arrays), the bounded doc-lists expand to candidate pairs
    map-side (nested transform, ≤ C(max_df,2) per shingle) — there
    is no shingle self-join at all."""
    from datasette_upload_csvs_spark.operators import dedup
    from datasette_upload_csvs_spark.sources.parquet import read_table

    df = dedup.ngram_jaccard_pairs(
        read_table(spark, sf_dir, "documents"), threshold=0.3, max_df=20
    )
    txt = plans.executed_plan(df)
    assert "array_join" not in txt  # hash shingles, not strings
    # the initial (pre-AQE) plan carries every exchange explicitly:
    # exactly one hashes on the shingle column
    # count DISTINCT exchanges: the cached capped-index
    # (InMemoryRelation) reprints its lineage — and with it the one
    # shingle exchange — once per consumer, same plan_id each time
    shingle_exchanges = {
        ln[ln.rindex("[plan_id=") :]
        for ln in txt.splitlines()
        if "Exchange hashpartitioning(shingle" in ln
    }
    assert len(shingle_exchanges) == 1, txt
    # pair expansion is an explode over the grouped doc-lists, not a
    # join keyed on the shingle
    assert "Join [shingle" not in txt and "Join shingle" not in txt
    spark.catalog.clearCache()


def test_restricted_jaccard_semijoins_before_expansion(spark, sf_dir):
    """The incremental-append path (restrict_to_ids) must cut the
    posting lists to batch-touching shingles BEFORE pair expansion —
    a broadcast LeftSemi on the shingle hash — so the Σ C(df,2)
    expansion scales with the batch, not the corpus."""
    from datasette_upload_csvs_spark.operators import dedup
    from datasette_upload_csvs_spark.sources.parquet import read_table

    docs = read_table(spark, sf_dir, "documents")
    batch = docs.select("doc_id").limit(2)
    df = dedup.ngram_jaccard_pairs(
        docs, threshold=0.3, max_df=20, restrict_to_ids=batch
    )
    txt = plans.executed_plan(df)
    semi = [
        ln for ln in txt.splitlines()
        if "LeftSemi" in ln and "shingle" in ln
    ]
    assert semi, txt  # the batch-shingle cut exists and keys on shingle
    assert all("BroadcastHashJoin" in ln for ln in semi), txt
    spark.catalog.clearCache()


def test_gopher_filters_are_map_only(spark, sf_dir):
    """The Gopher doc-quality ruleset must cost zero exchanges — all
    signals derive from the doc's own token array, fused with the
    scan. At 100 TB this filter is free relative to the read."""
    df = Q.gopher_quality_filters(spark, sf_dir)
    txt = plans.executed_plan(df)
    assert not [
        ln for ln in txt.splitlines()
        if "Exchange" in ln and "Reused" not in ln
    ], txt


def test_decontaminate_broadcasts_benchmark_grams(spark, sf_dir):
    """The benchmark gram set (tiny at any corpus scale) must reach
    the train side as a broadcast — the corpus-sized gram relation
    never shuffles for the join, only for the final per-doc count."""
    df = Q.decontaminate_exact_ngram(spark, sf_dir)
    txt = plans.executed_plan(df)
    assert "BroadcastExchange" in txt
    assert "SortMergeJoin" not in txt
    assert set(plans.read_schema_columns(df)) <= {"doc_id", "source", "text"}


def test_semdedup_pairs_are_cluster_bucketed(spark, sf_dir):
    """SemDeDup: the quantizer anchors broadcast for scoring (a
    deliberate n x k broadcast cross join — the only
    BroadcastNestedLoopJoins allowed are those anchor scans, built
    from the tiny IdentityBroadcastMode anchor table), and pair
    generation is the cluster-bucket EQUI-join — never an all-pairs
    nested loop over the corpus against itself."""
    df = Q.semdedup_prune(spark, sf_dir)
    txt = plans.executed_plan(df)
    # pair join is keyed on cluster_id
    assert "Join [cluster_id" in txt or "SortMergeJoin [cluster_id" in txt
    # every nested-loop join is an anchor-broadcast scoring join:
    # k-row build side, identity mode (crossJoin of the broadcast
    # anchors) — the corpus is never the build side of an NLJ
    assert txt.count("BroadcastNestedLoopJoin") == txt.count(
        "BroadcastExchange IdentityBroadcastMode"
    )


def test_dsir_lambda_table_broadcasts(spark, sf_dir):
    """DSIR: the 4096-bucket λ table is constant-size and must
    broadcast onto the per-doc counts; the corpus pays exactly its
    two algorithmic shuffles (bucket count, per-doc agg)."""
    df = Q.dsir_importance_weights(spark, sf_dir)
    txt = plans.executed_plan(df)
    assert "BroadcastExchange" in txt
    assert set(plans.read_schema_columns(df)) <= {"doc_id", "text"}


def test_dsir_resample_is_partial_topk(spark, sf_dir):
    """The Gumbel-top-k selection must compile to
    TakeOrderedAndProject (per-partition partial top-k, driver heap
    merge) — never a global sort of the weight table; the rank
    window runs after the 200-row limit, so its single partition
    holds exactly k rows."""
    df = Q.dsir_resample_topk(spark, sf_dir)
    txt = plans.executed_plan(df)
    assert "TakeOrderedAndProject" in txt
    assert "Sort [k" not in txt  # no standalone global sort of keys


def test_ccnet_buckets_use_banded_rank(spark, sf_dir):
    """CCNet terciles must use the two-phase distributed rank: the
    doc-stream window partitions on (lang, band) — many partitions —
    and the per-language windows touch only the tiny band-count and
    language-count aggregates, which broadcast back. A plain
    per-language window over the docs (5 giant partitions) would
    show Exchange hashpartitioning(predicted_lang) feeding a Window
    over the doc stream."""
    df = Q.ccnet_perplexity_buckets(spark, sf_dir)
    txt = plans.executed_plan(df)
    # every row_number over the doc stream is keyed on (lang, band)
    doc_windows = [
        ln
        for ln in txt.splitlines()
        if "Window" in ln and "row_number" in ln
    ]
    assert doc_windows and all("_band" in ln for ln in doc_windows), txt
    # band prefixes and language counts reach the docs as broadcasts
    assert txt.count("BroadcastExchange") >= 2
    assert "SortMergeJoin" not in txt


def test_quality_classifier_single_shuffle(spark, sf_dir):
    """Hashed-feature scoring is map-side until the one per-doc
    aggregation: no feature-keyed shuffle, no weight-table join —
    the entire point of the hashing trick at corpus scale."""
    df = Q.quality_classifier_score(spark, sf_dir)
    assert plans.shuffle_count(df) == 1
    assert "Join" not in plans.executed_plan(df)
    assert set(plans.read_schema_columns(df)) <= {"doc_id", "text"}


def test_exact_substr_windows_are_doc_keyed(spark, sf_dir):
    """ExactSubstr spans: the islands merge must run in per-doc
    windows (doc_id partitioning — no giant keys), the window-hash
    count must keep partial (map-side) aggregation, and the scan
    must read only {doc_id, text}."""
    df = Q.dedup_exact_substr_spans(spark, sf_dir)
    txt = plans.executed_plan(df)
    seq_windows = [
        ln
        for ln in txt.splitlines()
        if "Window" in ln and ("lag(" in ln or "sum(" in ln)
    ]
    assert seq_windows and all("doc_id" in ln for ln in seq_windows), txt
    assert "partial_count" in txt or "partial" in txt.lower()
    assert set(plans.read_schema_columns(df)) <= {"doc_id", "text"}


def test_multimodal_near_dup_no_cartesian(spark, sf_dir):
    """The binary near-dup pipeline must candidate-join on the
    pigeonhole (chunk, val) keys — a cartesian/nested-loop product
    in the plan would mean the bucketing regressed to all-pairs."""
    df = Q.multimodal_near_dup_pairs(spark, sf_dir)
    plan = plans.executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_star_groups_no_clique_expansion(spark, sf_dir):
    """The star-routed group consumers never build the blocked clique
    expansion (its _start/blk slicing machinery), even when present:
    connectivity comes from K-1 star edges. (At fixture dup mass the
    gate is closed so neither path runs — the pin still catches a
    routing regression that would inline the expansion operators.)"""
    for fn in (Q.dedup_groups, Q.simhash_dup_groups, Q.multimodal_dup_groups):
        df = fn(spark, sf_dir)
        plan = plans.executed_plan(df)
        assert "_start" not in plan, fn.__name__
        spark.catalog.clearCache()


def test_phash_fingerprints_single_scan(spark, sf_dir):
    """Both perceptual hashes come from ONE Arrow pass over the
    payload column: exactly one parquet scan of documents in the
    plan, no shuffle at all (map-only)."""
    df = Q.multimodal_phash_fingerprints(spark, sf_dir)
    assert plans.shuffle_count(df) == 0
    plan = plans.executed_plan(df)
    assert plan.count("Scan parquet") == 1


import pytest as _pytest

from datasette_upload_csvs_spark.queries import _DRIVER_PRIORITY as _PRIO


@_pytest.mark.parametrize("name", sorted(set(_PRIO) & set(Q.queries())))
def test_changed_entries_never_cartesian(name, spark, sf_dir):
    """Per-commit form of plan_audit.py for the entries whose code
    changed this round: none may compile to a CartesianProduct (the
    unbroadcast all-pairs failure). BroadcastNestedLoopJoin is allowed
    — bounded-broadcast cross joins are intentional (see
    plan_audit.py's baseline)."""
    df = Q.queries()[name](spark, sf_dir)
    assert "CartesianProduct" not in plans.executed_plan(df), name
    spark.catalog.clearCache()


def test_wide_fingerprint_pairs_stay_bucketed(spark, sf_dir):
    """simhash128_dup_groups' pair source must stay the pigeonhole
    chunk join at 32-bit keys: the pre-closure plan carries the
    (chunk, val) equi-join (an Exchange hashpartitioning on chunk),
    never a cartesian or nested-loop pairing — the sub-quadratic
    property BENCH_FP_SCALE measures."""
    from datasette_upload_csvs_spark.operators import dedup
    from datasette_upload_csvs_spark.sources.parquet import read_table

    fp = dedup.simhash128(read_table(spark, sf_dir, "documents"))
    pairs = dedup.fingerprint_hamming_pairs_wide(
        fp, ["fp0", "fp1"], "doc_id", max_hamming=3, pair_mode="star"
    )
    txt = plans.executed_plan(pairs)
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt
    assert "chunk" in txt and "val" in txt  # the equi-join key
    pairs.unpersist()
    spark.catalog.clearCache()

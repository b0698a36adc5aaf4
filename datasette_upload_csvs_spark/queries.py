"""Named query registry: SURVEY.md §2's operator inventory, one
entry per operator, each with a DuckDB oracle-SQL twin.

Contract (driver harness): each query is ``(spark, sf_dir) -> DataFrame``;
the oracle SQL runs on the same parquet files in DuckDB and must
hash-match (row count + schema + order-insensitive value hash).

Determinism rules used throughout (they are why the oracles match):

- SUM/AVG over doubles: summation order is engine-dependent, so both
  sides cast to DECIMAL first (exact arithmetic), then cast the exact
  result back to double. AVG = exact-sum / count as explicit division.
- top-k / window ordering: always a unique total order (tiebreak on a
  key column).
- computed floats (cosine, ratios): round(…, 6) on both sides; raw
  filters use the identical unrounded expression on both sides.
- type alignment: DuckDB count/len/rank → BIGINT where Spark gives
  int, so oracles CAST to the Spark-side type explicitly.

The relational rows (B1-B28) delegate to Catalyst builtins — the
reference delegates exactly this surface to SQLite (SURVEY.md §2
Part B). Extension rows (B29+) call the operators/ modules.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datasette_upload_csvs_spark.operators import dedup, similarity, textstats
from datasette_upload_csvs_spark.functions.text import (
    SPLIT_RE,
    STOPWORDS,
    TOKEN_RE,
    tokens as _text_tokens,
)
from datasette_upload_csvs_spark.functions.vector import as_double_array

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def _vector_backend() -> str:
    """Which execution path the vector-tier registry entries use:

    - "expression" (default): Catalyst higher-order-function cosines —
      interpreted, but mirrored bit-for-bit by the DuckDB oracles.
    - "arrow": the numpy/Arrow production twins (operators/
      *_arrow.py) — one matmul per batch instead of n×k interpreted
      folds; ~25-100× on the embedding tier (PLANS_r06.md §5c).

    Routed entries: semdedup_prune, d4_prototype_prune,
    kmeans_lloyd_step, semantic_decontamination.
    tests/test_oracle_parity.py runs the routed entries under BOTH
    settings, so the swap is a tested configuration, not prose."""
    return os.environ.get(
        "SPARK_GRAFT_VECTOR_BACKEND", "expression"
    ).strip().lower()


def q(name: str, oracle: str | None = None):
    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# Names hash-verified by the driver at sf0.01 (union of
# CORRECTNESS_r01..r05.json) AT THEIR CURRENT IMPLEMENTATION.
# The driver samples a prefix of the registry, so listing these LAST
# rotates the not-yet-driver-checked queries into the sample while
# keeping every name stable.
#
# Rule (round-2 ADVICE): any query whose implementation or oracle
# changed AFTER its last driver check must NOT appear here — it goes
# in _DRIVER_PRIORITY so the independent check re-runs on the new
# code.
_DRIVER_PRIORITY = [
    # Round-14 sample = this list, then any fresh (never-checked,
    # non-priority) registry entries, then _DRIVER_CHECKED. Every
    # name here has code in its call path that CHANGED this round
    # (rotation rule: changed entries re-queue for an independent
    # driver check). All inside the 50-name prefix.
    #
    # Round-14 changes re-queuing these (same 10 names as round 13 —
    # the r14 optimization round touched the same two call-path
    # families): (a) minhash_lsh_candidates' "auto" probe now rides a
    # persist of the SIGNATURE relation instead of the full banded
    # relation (function body shared by every minhash_near_dup_pairs
    # caller), and curation_funnel_staged additionally flipped to
    # release_stage_frames=True / scratch_checkpoints; (b)
    # connected_components' small-graph fast path gate changed from
    # row-count to observed id-bytes (ADVICE r13, graph.py) —
    # touching every *_dup_groups / split entry.
    "curation_funnel_staged",   # run_curation_funnel, auto default
    "dedup_groups",
    "split_cluster_safe",
    "dedup_rate_by_source",
    "dedup_minhash_lsh",
    "dedup_keep_best",
    # CC fast-path consumers (change b):
    "simhash_dup_groups",
    "simhash128_dup_groups",
    "multimodal_dup_groups",
    "split_incremental_stable",
    # (c) resumed r14 session: the exact-dup collapse gate in all
    # three families (minhash text / fingerprint / embedding ANN)
    # now reads its statistic from one count_distinct aggregate
    # (dedup._dup_mass_stats) — the minhash/fp consumers above are
    # already queued; these two cover the embedding-ANN gate
    # (embedding_ann_batch) and the fp gate's pigeonhole consumer:
    "ann_bands_recall",
    "multimodal_near_dup_pairs",
    # fp-gate consumer via simhash_near_dup_pairs(portable=True):
    "dedup_simhash",
]

_DRIVER_CHECKED = frozenset({
    # names green at their latest driver check whose round-14 call
    # paths did NOT change (the round-14 changed-path names stay in
    # _DRIVER_PRIORITY above):
    "multimodal_phash_fingerprints", "multimodal_feature_extract",
    "simhash_fingerprints_portable", "simhash128_fingerprints",
    "simhash256_fingerprints",
    # r8-green priority names whose code did not change in round 9:
    "dedup_cross_source_matrix", "dedup_graph_triangles",
    "dedup_containment", "dedup_ngram_jaccard_capped",
    "dedup_ngram_jaccard_allpairs_smallcorpus",
    "semdedup_prune_arrow", "d4_prototype_prune_arrow",
    "semdedup_prune", "d4_prototype_prune",
    "dedup_exact_substr_removed", "dedup_exact_substr_spans",
    "minhash_oph_agreement",
    "skew_salted_distinct_parts", "skew_salted_join_priority_revenue",
    # r7-green priority names whose code did not change in round 8:
    "kmeans_lloyd_step_arrow", "data_constrained_epochs",
    "perplexity_band_filter", "doremi_domain_reweight",
    "lsh_band_scurve", "dedup_embedding_cosine",
    "similarity_pq_recall", "similarity_ivf_recall",
    "cms_token_heavy_hitters",
    "kmeans_lloyd_step", "semantic_decontamination",
    "abtt_cleaned_topk",
    "aqp_groupwise_ci",
    "aqp_sample_estimate",
    "array_agg_region_nations",
    "benford_first_digit",
    "bm25_doc_ranking",
    "curation_pipeline_funnel",
    "doc_rolling_hash",
    "dq_check_orders",
    "dsir_importance_weights",
    "dsir_resample_topk",
    "embedding_pca_power_iteration",
    "equidepth_histogram_price",
    "filtered_aggregates",
    "histogram2d_qty_price",
    "k_anonymity_audit",
    "merge_upsert_orders",
    "monthly_revenue_ewma",
    "monthly_trend_by_nation",
    "ngram_diversity_by_source",
    "not_in_null_semantics",
    "price_percentiles_by_status",
    "robust_dispersion_mad",
    "sample_deterministic",
    "sample_n_per_group_orders",
    "sample_stratified",
    "sample_weighted_orders",
    "snapshot_diff_orders",
    "softdedup_commonness_weights",
    "tokenizer_fertility_by_lang",
    "unigram_kl_by_source",
    "unimax_source_mix",
    "zipf_slope_by_source",
    "anti_join_no_orders", "approx_count_distinct", "approx_percentile_gate",
    "approx_quantile_tolerance", "argmax_priority_extreme_orders",
    "array_funcs_extended", "array_ops_embeddings", "asof_join_last_click",
    "attribution_first_last_touch", "bag_set_ops", "basket_brand_lift",
    "bigram_pmi_collocations", "bitwise_ops", "bloom_contamination_screen",
    "bool_aggs", "ccnet_perplexity_buckets", "chisq_contingency_flag_status",
    "conditional_case", "contamination_overlap",
    "corr_regression_qty_price", "correlated_avg_filter", "count_distinct",
    "cross_join_region_pairs", "cube_flag_status",
    "curation_mixture_rebalance", "curation_pack_chunks",
    "curation_pii_redact", "curation_repetition_stats",
    "curation_shuffle_order", "curation_strip_boilerplate",
    "daily_revenue_drawdown", "date_format_funcs", "date_funcs",
    "decontaminate_exact_ngram", 
    "dedup_exact_ranks", "dedup_ngram_coverage", "disjunctive_filter_join", "distinct_status_priority", "doc_keywords",
    
    "embedding_centroid_distance", "embedding_quantize_int8",
    "event_type_transition_matrix", "events_anomaly_mad_daily",
    "events_funnel", "events_resample_gapfill", "events_session_window",
    "events_sliding_window", "events_tumbling_window",
    "events_weekly_retention", "except_nations", "explode_doc_tokens",
    "export_balanced_shards", "export_shard_assignment",
    "feature_hashing_buckets", "filter_null_tests",
    "full_outer_nation_supplier", "fuzzy_name_pairs", "global_agg",
    "gopher_quality_filters", "group_by_all_sql", "grouped_pandas_zscore",
    "grouping_sets_mixed", "hash_funcs", "hash_sample", "having_filter",
    "hll_mergeable_distinct", "hybrid_rrf_retrieval", "intersect_nations",
    "interval_overlap_concurrency", "json_extract_events",
    "ks_price_returnflag_binned", "lateral_topk_per_nation",
    "left_join_order_counts", "limit_offset", "map_funcs_price_stats",
    "math_funcs", "math_funcs_extended", "means_family_price",
    "moments_skew_kurtosis",
    "multimodal_resize", "mutual_info_priority_flag",
    "null_safe_join_groups", "order_streak_islands", "outlier_orders_iqr",
    "pack_padding_waste", "pareto_abc_customers", "percentiles_price",
    "pivot_returnflag", "pivot_status_by_flag", "price_histogram",
    "q10_returned_items", "q11_important_stock", "q12_late_priority_mix",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_parts_supplier_count", "q17_small_quantity_revenue",
    "q18_large_volume_customers", "q19_disjunctive_revenue",
    "q1_pricing_summary", "q20_part_promotion_suppliers",
    "q21_waiting_suppliers", "q22_dormant_customers", "q2_min_cost_supplier",
    "q3_shipping_priority", "q4_order_priority", "q5_local_supplier_volume",
    "q6_revenue_change", "q7_volume_shipping", "q8_market_share",
    "q9_product_type_profit", "quality_classifier_score",
    "range_join_ship_lag", "recursive_cte_series", "regexp_funcs",
    "revenue_share_by_nation", "rfm_customer_segments",
    "rollup_nation_priority", "scd2_customer_versions",
    "semi_join_big_spenders", "sessionize_events_lag",
    "similarity_anchor_topk_batch",
    "similarity_anchor_topk_results", "similarity_lsh_recall", "similarity_lsh_topk_batch",
    "similarity_topk_batch",
    "similarity_topk_bruteforce", "sort_nulls_handling",
    "source_temperature_mix", "sql_scalar_subquery", "sqlite_compat_funcs",
    "stats_dispersion", "stratified_split_counts", "string_agg_suppliers",
    "string_funcs", "string_funcs_extended", "supplier_concentration_hhi",
    "table_profile", "text_bigram_freq", "text_bigram_logprob",
    "text_fingerprint", "text_lang_id", "text_quality",
    "text_tfidf_top_terms", "text_token_stats", "text_unigram_logprob",
    "text_vocab_coverage", "text_word_freq", "theta_join_richer_suppliers",
    "token_count_bpe", "token_entropy_by_lang", "topk_per_group",
    "udf_pandas_vowel_count", "udtf_chunk_text", "union_all_nation_keys",
    "unpivot_lineitem_metrics", "window_distribution", "window_ignore_nulls",
    "window_lag_lead_orders", "window_range_frame", "window_rank_customers",
    "window_running_total"
})


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Name → (spark, sf_dir) → DataFrame for every registry entry.

    Caching contract: a few entries persist a small multi-consumer
    aggregate that the RETURNED lazy plan still references
    (q11_important_stock, mutual_info_priority_flag), so they cannot
    unpersist before returning. A caller that runs many queries in
    one session should call spark.catalog.clearCache() between
    queries (bench.py does) — otherwise those cached frames (tiny:
    one row per part / a 15-cell contingency table) accumulate in
    executor storage for the session's lifetime."""
    prio = {n: _QUERIES[n] for n in _DRIVER_PRIORITY if n in _QUERIES}
    fresh = {
        n: f for n, f in _QUERIES.items()
        if n not in _DRIVER_CHECKED and n not in prio
    }
    checked = {n: f for n, f in _QUERIES.items() if n in _DRIVER_CHECKED}
    return {**prio, **fresh, **checked}


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from datasette_upload_csvs_spark.session import configure
    from datasette_upload_csvs_spark.sources.parquet import read_table

    # queries may run on a session we didn't build (the driver
    # harness); apply runtime-settable engine confs (AQE, UTC
    # session time, nanos handling) idempotently.
    configure(spark)
    return read_table(spark, sf_dir, name)


def _hashed_gram_rows(d: DataFrame, n: int, cols: list[str]):
    """(cols..., g) — one row per distinct n-token gram per doc, gram
    = multi-arg xxhash64 over the token slots. The token array is
    MATERIALIZED once per row behind a 1:1 explode(array(tokens))
    generator boundary; inline, CollapseProject substitutes the
    tokenizer split into every slot, re-tokenizing n× per window
    (the decontaminate_exact_ngram 9.8 s → 0.7 s fix). Equality
    classes match functions.text.shingles strings (short docs: one
    gram of all tokens, trailing nulls hash deterministically) up to
    ~2^-64 collisions — the hash never crosses engines."""
    toks = d.select(
        *[F.col(c) for c in cols],
        F.explode(F.array(_text_tokens(F.col("text")))).alias("_t"),
    )
    t = F.col("_t")
    idx = F.sequence(F.lit(0), F.greatest(F.size(t) - F.lit(n), F.lit(0)))
    grams = F.array_distinct(
        F.transform(
            idx, lambda i: F.xxhash64(*[F.get(t, i + j) for j in range(n)])
        )
    )
    return toks.select(
        *[F.col(c) for c in cols], F.explode(grams).alias("g")
    )


def _dsum(col, alias: str, scale: int = 4):
    """Exact distributed sum of a double column: decimal-cast partial
    sums are order-independent; final cast back to double."""
    return F.sum(col.cast(f"decimal(28,{scale})")).cast("double").alias(alias)


def _davg(col, alias: str, scale: int = 6):
    return (
        F.sum(col.cast(f"decimal(28,{scale})")).cast("double") / F.count(col)
    ).alias(alias)


# ====================================================================
# B1/B4/B5/B11/B19 — flagship: TPC-H Q1-shaped pricing summary
# ====================================================================


@q(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), "sum_qty"),
            _dsum(F.col("l_extendedprice"), "sum_base_price"),
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "sum_disc_price",
                6,
            ),
            _dsum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                "sum_charge",
                6,
            ),
            _davg(F.col("l_quantity"), "avg_qty"),
            _davg(F.col("l_extendedprice"), "avg_price"),
            _davg(F.col("l_discount"), "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ====================================================================
# B6 — multi-way equi-join + group + top-k (TPC-H Q3 shape)
# ====================================================================


@q(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    # customer is the small side → broadcast; lineitem⋈orders shuffles
    # on orderkey only.
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 6
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# ====================================================================
# B6/B7 — 6-way join through the star schema (TPC-H Q5 shape)
# ====================================================================


@q(
    "q5_local_supplier_volume",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lineitems
    FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # Dimensions broadcast (supplier/nation/region/customer are tiny
    # next to lineitem at any SF); the only shuffle is l⋈o on orderkey.
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 6
            ),
            F.count("*").alias("n_lineitems"),
        )
    )


@q(
    "q6_revenue_change",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter+sum — the pushdown showcase (all
    four predicates reach the parquet scan; zero shuffle, the global
    agg is a map-side partial + single-row merge)."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue", 6),
            F.count("*").alias("n_rows"),
        )
    )


@q(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
             AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 6
            )
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@q(
    "events_funnel",
    """
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           CAST(COUNT(CASE WHEN t_signup IS NOT NULL THEN 1 END) AS BIGINT)
             AS n_signup,
           CAST(COUNT(CASE WHEN t_signup < t_click THEN 1 END) AS BIGINT)
             AS n_signup_then_click,
           CAST(COUNT(CASE WHEN t_signup < t_click AND t_click < t_purchase
                      THEN 1 END) AS BIGINT) AS n_full_funnel
    FROM firsts
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel (signup → click → purchase ordering per
    user): one conditional-min aggregation — single shuffle on
    user_id regardless of event volume."""
    e = load(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "t_signup"
        ),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "t_click"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    return firsts.agg(
        F.count("*").alias("n_users"),
        F.count(F.when(F.col("t_signup").isNotNull(), 1)).alias("n_signup"),
        F.count(F.when(F.col("t_signup") < F.col("t_click"), 1)).alias(
            "n_signup_then_click"
        ),
        F.count(
            F.when(
                (F.col("t_signup") < F.col("t_click"))
                & (F.col("t_click") < F.col("t_purchase")),
                1,
            )
        ).alias("n_full_funnel"),
    )


@q(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join, then a tiny group-by.
    The semi join shuffles only (orderkey, shipdate/orderdate) pairs."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@q(
    "q13_customer_distribution",
    """
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS n_orders
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey)
    GROUP BY n_orders
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of orders-per-customer (two
    cascading aggregations; the second groups on a tiny domain)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


@q(
    "price_histogram",
    """
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           COUNT(*) AS n_orders,
           CAST(MIN(o_totalprice) AS DOUBLE) AS bucket_min,
           CAST(MAX(o_totalprice) AS DOUBLE) AS bucket_max
    FROM orders
    GROUP BY 1
    """,
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via arithmetic bucketing — partial-agg
    friendly (each executor builds its local histogram; merge is a
    sum per bucket)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("bucket")
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").cast("double").alias("bucket_min"),
            F.max("o_totalprice").cast("double").alias("bucket_max"),
        )
    )


@q(
    "unpivot_lineitem_metrics",
    """
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
           l_quantity AS value
    FROM lineitem WHERE l_orderkey < 50
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem WHERE l_orderkey < 50
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
    FROM lineitem WHERE l_orderkey < 50
    """,
)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape with the built-in unpivot (melt); the oracle
    is the portable UNION ALL equivalent."""
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 50)
    return l.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "metric",
        "value",
    )


@q(
    "having_filter",
    """
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_total
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    """,
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            _dsum(F.col("o_totalprice"), "sum_total"),
        )
        .filter(F.col("n_orders") >= 15)
    )


@q(
    "correlated_avg_filter",
    """
    WITH pa AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
               / COUNT(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l.l_partkey, l.l_orderkey, l.l_quantity
    FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
    WHERE l.l_quantity < 0.5 * pa.avg_qty
    """,
)
def correlated_avg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (rows below half their part's average) as an
    agg+self-join — the decorrelated plan Catalyst produces for the
    correlated subquery, written explicitly so the per-part average
    is decimal-exact on both engines."""
    l = load(spark, sf_dir, "lineitem")
    pa = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        _davg(F.col("l_quantity"), "avg_qty")
    )
    return (
        l.join(pa, l.l_partkey == pa.pk)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .select("l_partkey", "l_orderkey", "l_quantity")
    )


# ====================================================================
# B12 — global aggregate
# ====================================================================


@q(
    "global_agg",
    """
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship
    FROM lineitem
    """,
)
def global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return l.agg(
        F.count("*").alias("n_rows"),
        _dsum(F.col("l_quantity"), "sum_qty"),
        _davg(F.col("l_extendedprice"), "avg_price"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


# ====================================================================
# B13 — COUNT(DISTINCT)
# ====================================================================


@q(
    "count_distinct",
    """
    SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem
    """,
)
def count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return l.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


@q(
    "skew_salted_distinct_parts",
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT)
             AS n_distinct_l_partkey
    FROM lineitem GROUP BY l_returnflag
    """,
)
def skew_salted_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per key on the SALTED two-phase path
    (operators/skew.salted_count_distinct): (key, value) dedup
    sharded by value-hash salt so one hot key's distinct-set build
    spreads over 16 reducers, then shard counts sum exactly (shards
    partition the value space). The oracle is the plain
    COUNT(DISTINCT) — salting changes only the shuffle distribution,
    never the answer, and this entry pins that equality at the
    driver, not just in unit tests. The skew knob AQE does NOT cover:
    skewed AGGREGATION state, vs AQE's skewed-join splits."""
    from datasette_upload_csvs_spark.operators import skew

    return skew.salted_count_distinct(
        load(spark, sf_dir, "lineitem"), "l_returnflag", "l_partkey", salt=16
    )


@q(
    "skew_salted_join_priority_revenue",
    """
    SELECT o_orderpriority,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE)
             AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def skew_salted_join_priority_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Inner equi-join on the SALTED path (operators/skew.salted_join):
    left rows take a deterministic salt in [0, 8), the right side
    replicates 8×, and the join key becomes (key, salt) — one hot
    orderkey's rows land on 8 reducers instead of one. For when the
    build side is too big to broadcast and AQE's skew split is
    unavailable (shuffled-hash strategy). The oracle is the PLAIN
    join + aggregate: salting is distribution-only, the row multiset
    is identical — pinned at the driver over decimal-exact sums."""
    from datasette_upload_csvs_spark.operators import skew

    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    j = skew.salted_join(l, o, "l_orderkey", "o_orderkey", salt=8)
    return j.groupBy("o_orderpriority").agg(
        _dsum(F.col("l_extendedprice"), "revenue", 4),
        F.count("*").alias("n_items"),
    )


# ====================================================================
# B14 — approximate count-distinct (HLL), tolerance-checked
# ====================================================================


@q(
    "approx_count_distinct",
    """
    SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_count,
           TRUE AS within_tol
    FROM lineitem
    """,
)
def approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct is sketch-based, so engines can't match
    values; the contract checked here is |approx-exact|/exact ≤ 15%
    (HLL rsd default 5%). The oracle pins the exact count and the
    tolerance verdict."""
    l = load(spark, sf_dir, "lineitem")
    return l.agg(
        F.countDistinct("l_partkey").alias("exact_count"),
        F.approx_count_distinct("l_partkey").alias("approx"),
    ).select(
        "exact_count",
        (
            F.abs(F.col("approx") - F.col("exact_count"))
            / F.col("exact_count").cast("double")
            <= 0.15
        ).alias("within_tol"),
    )


# ====================================================================
# B15 — ROLLUP / CUBE
# ====================================================================


@q(
    "rollup_nation_priority",
    """
    SELECT n_name, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_total
    FROM orders JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, o_orderpriority)
    """,
)
def rollup_nation_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            _dsum(F.col("o_totalprice"), "sum_total"),
        )
    )


@q(
    "cube_flag_status",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"), _dsum(F.col("l_quantity"), "sum_qty")
    )


# ====================================================================
# B16 — ranking window functions
# ====================================================================


@q(
    "window_rank_customers",
    """
    SELECT c_custkey, c_nationkey, c_acctbal,
           CAST(row_number() OVER w AS INTEGER) AS rn,
           CAST(rank() OVER w AS INTEGER) AS rnk,
           CAST(dense_rank() OVER w AS INTEGER) AS drnk,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_rank_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


# ====================================================================
# B17 — lag / lead / first / last
# ====================================================================


@q(
    "window_lag_lead_orders",
    """
    SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER w AS last_price_so_far
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price_so_far"),
    )


# ====================================================================
# B18 — framed window aggregates (running total, moving average)
# ====================================================================


@q(
    "window_running_total",
    """
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg3
    FROM orders
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    wbase = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wrun = wbase.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wmov = wbase.rowsBetween(-2, Window.currentRow)
    dec = F.col("o_totalprice").cast("decimal(28,4)")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(dec).over(wrun).cast("double").alias("running_total"),
        (F.sum(dec).over(wmov).cast("double") / F.count(F.lit(1)).over(wmov)).alias(
            "moving_avg3"
        ),
    )


@q(
    "window_range_frame",
    """
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) OVER
                (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                 RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS spend_30d
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame keyed on event time: per-customer trailing-30-day
    spend. Range frames include order-value peers, so no tiebreak is
    needed for determinism (peers aggregate identically)."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(28,4)"))
        .over(w)
        .cast("double")
        .alias("spend_30d"),
    )


# ====================================================================
# B20 — per-group top-k
# ====================================================================


@q(
    "topk_per_group",
    """
    SELECT c_mktsegment, c_custkey, c_acctbal, CAST(rn AS INTEGER) AS rn
    FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
                 row_number() OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal DESC, c_custkey) AS rn
          FROM customer)
    WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# ====================================================================
# B8 — semi / anti joins
# ====================================================================


@q(
    "semi_join_big_spenders",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def semi_join_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@q(
    "anti_join_no_orders",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# ====================================================================
# B7 — outer joins
# ====================================================================


@q(
    "left_join_order_counts",
    """
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_total
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            _dsum(F.col("o_totalprice"), "sum_total"),
        )
    )


@q(
    "full_outer_nation_supplier",
    """
    SELECT n_name, s_name
    FROM nation FULL OUTER JOIN supplier ON n_nationkey = s_nationkey
    """,
)
def full_outer_nation_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    return n.join(s, n.n_nationkey == s.s_nationkey, "full").select(
        "n_name", "s_name"
    )


# ====================================================================
# B9 — cross join / theta join
# ====================================================================


@q(
    "cross_join_region_pairs",
    """
    SELECT r1.r_name AS r1_name, r2.r_name AS r2_name
    FROM region r1 CROSS JOIN region r2
    """,
)
def cross_join_region_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region")
    r1 = r.select(F.col("r_name").alias("r1_name"))
    r2 = r.select(F.col("r_name").alias("r2_name"))
    return r1.crossJoin(r2)


@q(
    "theta_join_richer_suppliers",
    """
    SELECT s_suppkey, COUNT(*) AS n_poorer_customers
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
    GROUP BY s_suppkey
    """,
)
def theta_join_richer_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    return (
        s.join(
            c,
            (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal),
        )
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_poorer_customers"))
    )


# ====================================================================
# B10 — range/interval predicate join
# ====================================================================


@q(
    "range_join_ship_lag",
    """
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
     AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 90 DAY
    GROUP BY 1
    """,
)
def range_join_ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    return (
        l.join(
            o,
            (l.l_orderkey == o.o_orderkey)
            & F.col("l_shipdate").between(
                F.col("o_orderdate"),
                F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
            ),
        )
        .groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(
            F.count("*").alias("n_items"),
            _dsum(F.col("l_extendedprice"), "sum_price"),
        )
    )


# ====================================================================
# B21/B22 — set operations
# ====================================================================


@q(
    "union_all_nation_keys",
    """
    SELECT nationkey, COUNT(*) AS n
    FROM (SELECT c_nationkey AS nationkey FROM customer
          UNION ALL
          SELECT s_nationkey AS nationkey FROM supplier)
    GROUP BY nationkey
    """,
)
def union_all_nation_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.union(s).groupBy("nationkey").agg(F.count("*").alias("n"))


@q(
    "intersect_nations",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@q(
    "except_nations",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.subtract(s)


# ====================================================================
# B23 — DISTINCT
# ====================================================================


@q(
    "distinct_status_priority",
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def distinct_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority"
    ).distinct()


# ====================================================================
# B24 — string functions
# ====================================================================


@q(
    "string_funcs",
    """
    SELECT p_partkey,
           lower(p_name) AS lower_name,
           upper(p_brand) AS upper_brand,
           substring(p_name, 1, 8) AS name_prefix,
           replace(p_type, ' ', '_') AS type_underscored,
           CAST(length(p_name) AS INTEGER) AS name_len,
           concat_ws('|', p_brand, p_type) AS brand_type,
           CAST(strpos(p_name, 'e') AS INTEGER) AS e_pos,
           trim(p_name) AS trimmed,
           p_name LIKE '%re%' AS has_re
    FROM part
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lower_name"),
        F.upper("p_brand").alias("upper_brand"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_underscored"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.instr(F.col("p_name"), "e").alias("e_pos"),
        F.trim("p_name").alias("trimmed"),
        F.col("p_name").like("%re%").alias("has_re"),
    )


# ====================================================================
# B25 — date/time functions
# ====================================================================


@q(
    "date_funcs",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month_num,
           CAST(day(o_orderdate) AS INTEGER) AS order_day,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(o_orderdate AS DATE) + 30 AS plus_30,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_95
    FROM orders
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month_num"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        d.alias("order_date"),
        F.date_add(d, 30).alias("plus_30"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_95"),
    )


# ====================================================================
# B26 — math functions
# ====================================================================


@q(
    "math_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_quantity / 7.0, 3) AS qty_div7,
           abs(l_discount - 0.05) AS abs_disc_delta,
           CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
           CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
           l_linenumber % 3 AS mod3,
           power(l_quantity, 2) AS qty_sq,
           round(sqrt(l_extendedprice), 6) AS sqrt_price
    FROM lineitem
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_quantity") / 7.0, 3).alias("qty_div7"),
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc_delta"),
        F.ceil("l_extendedprice").alias("ceil_price"),
        F.floor("l_extendedprice").alias("floor_price"),
        (F.col("l_linenumber") % 3).alias("mod3"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
    )


# ====================================================================
# B27 — conditional expressions
# ====================================================================


@q(
    "conditional_case",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 150000 THEN 'mid'
                ELSE 'small' END AS size_class,
           coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_x,
           o_orderpriority IN ('1-URGENT', '2-HIGH') AS is_high_priority,
           CAST(floor(o_totalprice) AS BIGINT) AS price_int
    FROM orders
    """,
)
def conditional_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 150000, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_x"
        ),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("is_high_priority"),
        F.floor("o_totalprice").cast("bigint").alias("price_int"),
    )


# ====================================================================
# B28 — JSON extraction
# ====================================================================


@q(
    "json_extract_events",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(SUM(k) AS DOUBLE) / COUNT(k) AS avg_k,
           MIN(k) AS min_k, MAX(k) AS max_k
    FROM (SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events)
    GROUP BY event_type
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint").alias("k")
    return (
        e.select("event_type", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            (F.sum("k").cast("double") / F.count("k")).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


# ====================================================================
# B29 — array ops over embeddings
# ====================================================================


@q(
    "array_ops_embeddings",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
           round(CAST(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE))) AS DOUBLE) / len(embedding), 6) AS mean_val,
           CAST(list_max(embedding) AS DOUBLE) AS max_val
    FROM embeddings
    """,
)
def array_ops_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    v = as_double_array(F.col("embedding"))
    ssum = F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x)
    vsum = F.aggregate(v, F.lit(0.0), lambda a, x: a + x)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(ssum), 6).alias("l2_norm"),
        F.round(vsum / F.size("embedding"), 6).alias("mean_val"),
        F.array_max("embedding").cast("double").alias("max_val"),
    )


# ====================================================================
# B30 — tumbling / sliding time windows (batch form)
# ====================================================================


@q(
    "events_tumbling_window",
    """
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS bucket_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            _dsum(F.col("value"), "sum_value", 6),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@q(
    "events_sliding_window",
    """
    SELECT bucket_start, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM (
      SELECT time_bucket(INTERVAL '10 minutes', ts,
                         TIMESTAMP '2024-01-01 00:00:00') AS bucket_start, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '10 minutes', ts,
                         TIMESTAMP '2024-01-01 00:05:00') AS bucket_start, value FROM events
    )
    GROUP BY bucket_start
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 minutes: each event falls in
    exactly two windows; the oracle reconstructs them as two shifted
    tumbling bucketings."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            _dsum(F.col("value"), "sum_value", 6),
        )
        .select(
            F.col("w.start").alias("bucket_start"), "n_events", "sum_value"
        )
    )


# ====================================================================
# B32 — session windows (batch form)
# ====================================================================


@q(
    "events_session_window",
    """
    WITH o AS (
      SELECT user_id, event_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), marked AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts >= INTERVAL '5 minutes'
                     THEN 1 ELSE 0 END AS new_session
      FROM o
    ), sessions AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 5-minute gap via F.session_window —
    Spark merges events closer than the gap; the oracle reconstructs
    identical sessions with the classic lag + cumulative-sum SQL."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            _dsum(F.col("value"), "sum_value", 6),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


# ====================================================================
# B37 — dedup family (extension operators)
# ====================================================================


@q(
    "dedup_exact_ranks",
    """
    SELECT doc_id, md5(text) AS content_hash,
           CAST(row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)
                AS INTEGER) AS dup_rank,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
             AS is_keeper
    FROM documents
    """,
)
def dedup_exact_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dup_ranks(load(spark, sf_dir, "documents"))


_JACCARD_ORACLE = """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                 x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, UNNEST(range(1, greatest(len(t) - 1, 2))) AS u(i)
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, shared, sa.n AS n_a, sb.n AS n_b,
           CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) AS jaccard
    FROM pairs JOIN sizes sa ON id_a = sa.doc_id
               JOIN sizes sb ON id_b = sb.doc_id
    WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= {thr}
"""


@q(
    "dedup_ngram_jaccard_allpairs_smallcorpus",
    _JACCARD_ORACLE.format(thr="0.3"),
)
def dedup_ngram_jaccard_allpairs_smallcorpus(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Uncapped exact-Jaccard baseline — SMALL/TRUSTED CORPORA ONLY,
    and the registry name now says so (round-8 VERDICT item 4: no
    undecorated name whose plan is all-pairs; the operator's own
    max_df default is the capped branch too, so the uncapped plan
    requires max_df=None EXPLICITLY at both the registry and the
    operator layer).

    max_df=None means the shingle inverted-index self-join has no
    frequent-item cut: one boilerplate shingle present in df docs
    creates an O(df²) candidate bucket, which dominates the job at
    corpus scale. This entry exists as the oracle-exact small-corpus
    baseline; every production-scale path must use the capped twin
    (dedup_ngram_jaccard_capped / default max_df) or the MinHash+LSH
    route (dedup_minhash_lsh)."""
    return dedup.ngram_jaccard_pairs(
        load(spark, sf_dir, "documents"), threshold=0.3, max_df=None
    )


@q(
    "dedup_minhash_lsh",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                 x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, UNNEST(range(1, greatest(len(t) - 1, 2))) AS u(i)
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) AS jaccard
    FROM pairs JOIN sizes sa ON id_a = sa.doc_id
               JOIN sizes sb ON id_b = sb.doc_id
    WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.7
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidates, exact-verified at jaccard ≥ 0.7.

    Output is exact (candidates are verified), so the oracle is the
    exact-Jaccard SQL. LSH recall at j=0.7 with 32 bands × 4 rows is
    0.9998 and ≥ 1-1e-15 for j ≥ 0.9; because the oracle is the
    EXACT edge set, the query unions the capped rare-shingle
    candidate floor (exact_floor_max_df) so equality is structural,
    not probabilistic — a miss would need all 32 bands AND every
    shared shingle hot, simultaneously.
    """
    return dedup.minhash_near_dup_pairs(
        load(spark, sf_dir, "documents"),
        threshold=0.7,
        exact_floor_max_df=_FLOOR_MAX_DF,
    )


@q(
    "minhash_oph_agreement",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           TRUE AS all_slots_dense,
           TRUE AS exact_dup_identical,
           TRUE AS neardup_agreement_ok
    FROM documents
    """,
)
def minhash_oph_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry for one-permutation MinHash (dedup.oph_signatures —
    the |shingles|×k → |shingles| arithmetic cut that wins at 100 TB,
    see its docstring). Signature VALUES are engine-internal hashes
    (never cross engines), so the oracle pins behavioral invariants
    instead, each deterministic on the fixed corpus:

    - all_slots_dense: rotation densification leaves no null slot in
      any of the 128 bins, including docs with fewer shingles than
      bins;
    - exact_dup_identical: planted exact-duplicate pairs (identical
      shingle sets) agree on ALL 128 slots — the property banding
      relies on;
    - neardup_agreement_ok: planted one-token-edit twins agree on
      ≥ 60 % of slots — E[agreement] ≈ j per non-empty bin. The edit
      changes 3 of (t−2) shingles, so j = (t−5)/(t+1): twins are
      planted only on docs with ≥ 24 tokens (j ≥ 0.76), leaving a
      wide margin over the 0.6 floor under any corpus regeneration;
      a shorter doc's single whole-doc shingle would make j ≈ 0 and
      the gate would measure the corpus, not OPH. Vacuously true if
      no doc qualifies."""
    base = load(spark, sf_dir, "documents").select("doc_id", "text")
    exact = base.filter(F.pmod("doc_id", F.lit(10)) == 0).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
    )
    near = (
        base.filter(F.pmod("doc_id", F.lit(10)) == 5)
        .filter(F.size(_text_tokens(F.col("text"))) >= 24)
        .select(
            (F.col("doc_id") + F.lit(20_000_000)).alias("doc_id"),
            F.regexp_replace("text", r"^\S+", "zzqqx").alias("text"),
        )
    )
    corpus = base.unionByName(exact).unionByName(near)
    from datasette_upload_csvs_spark.operators.dedup import (
        _hash_shingle_frame,
        oph_signatures,
    )

    sets = _hash_shingle_frame(corpus, "text", "doc_id", 3)
    sig = oph_signatures(sets).persist()
    n_null = sig.filter(
        F.exists("signature", lambda x: x.isNull())
        | (F.size("signature") != 128)
    ).count()
    agree = F.aggregate(
        F.zip_with(
            "sa", "sb", lambda x, y: F.when(x == y, 1).otherwise(0)
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )

    def _pair_min_agree(offset: int) -> int:
        pa = sig.select(
            F.col("doc_id").alias("id_b"), F.col("signature").alias("sb")
        ).filter(F.col("id_b") >= offset).filter(F.col("id_b") < offset + 10_000_000)
        pb = sig.select(
            (F.col("doc_id") + offset).alias("id_b"),
            F.col("signature").alias("sa"),
        )
        row = (
            pa.join(pb, "id_b")
            .select(agree.alias("n_agree"))
            .agg(F.min("n_agree"))
            .first()
        )
        return row[0]

    min_exact = _pair_min_agree(10_000_000)
    min_near = _pair_min_agree(20_000_000)
    n_docs = base.count()
    sig.unpersist()
    return spark.createDataFrame(
        [
            (
                n_docs,
                n_null == 0,
                min_exact == 128,
                # 0.6 * 128 = 77, wide margin below E[j·128] at the
                # ≥24-token plant; vacuously true if no doc qualifies
                min_near is None or min_near >= 77,
            )
        ],
        "n_docs bigint, all_slots_dense boolean, "
        "exact_dup_identical boolean, neardup_agreement_ok boolean",
    )


_CAPPED_CONTAINMENT_ORACLE = """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                 x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, UNNEST(range(1, greatest(len(t) - 1, 2))) AS u(i)
    ), dfreq AS (
      SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle
    ), rare AS (
      SELECT s.doc_id, s.shingle
      FROM sh s JOIN dfreq d ON s.shingle = d.shingle
      WHERE d.df <= {max_df}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), pairs AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS shared
      FROM cand c JOIN sh a ON a.doc_id = c.id_a
                  JOIN sh b ON b.doc_id = c.id_b AND a.shingle = b.shingle
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(shared AS DOUBLE) / least(sa.n, sb.n) AS containment
    FROM pairs JOIN sizes sa ON id_a = sa.doc_id
               JOIN sizes sb ON id_b = sb.doc_id
    WHERE CAST(shared AS DOUBLE) / least(sa.n, sb.n) >= {thr}
"""


@q("dedup_containment", _CAPPED_CONTAINMENT_ORACLE.format(max_df=20, thr="0.6"))
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment (overlap coefficient): shared/min(|A|,|B|) — the
    measure that catches a short document wholly embedded in a longer
    one, which Jaccard dilutes. Same shingle inverted index, different
    normalizer.

    Candidate generation is max_df-capped (shingles in > 20 docs are
    excluded from the inverted-index self-join — the frequent-item
    cut), then candidates are verified with EXACT counts over the
    full shingle sets, so a boilerplate shingle present in df docs
    can never create an O(df²) bucket. The oracle implements the
    identical cap. The uncapped single-pass form remains available as
    dedup.ngram_jaccard_pairs(max_df=None) — the small/trusted-corpus
    baseline."""
    pairs = dedup.ngram_jaccard_pairs(
        load(spark, sf_dir, "documents"),
        threshold=0.0,
        max_df=20,
        # count-filter prune: pairs whose containment UPPER BOUND
        # (from 3 ints, before any array work) is < 0.6 skip the
        # exact verify — output-invariant vs the oracle
        prune_ub=("containment", 0.6),
    )
    return (
        pairs.withColumn(
            "containment",
            F.col("shared").cast("double")
            / F.least("n_a", "n_b").cast("double"),
        )
        .filter(F.col("containment") >= 0.6)
        .select("id_a", "id_b", "containment")
    )


_CAPPED_JACCARD_ORACLE = """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                 x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, UNNEST(range(1, greatest(len(t) - 1, 2))) AS u(i)
    ), dfreq AS (
      SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle
    ), rare AS (
      SELECT s.doc_id, s.shingle
      FROM sh s JOIN dfreq d ON s.shingle = d.shingle
      WHERE d.df <= {max_df}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), pairs AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS shared
      FROM cand c JOIN sh a ON a.doc_id = c.id_a
                  JOIN sh b ON b.doc_id = c.id_b AND a.shingle = b.shingle
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, shared, sa.n AS n_a, sb.n AS n_b,
           CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) AS jaccard
    FROM pairs JOIN sizes sa ON id_a = sa.doc_id
               JOIN sizes sb ON id_b = sb.doc_id
    WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= {thr}
"""


@q("dedup_ngram_jaccard_capped", _CAPPED_JACCARD_ORACLE.format(max_df=20, thr="0.3"))
def dedup_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB-shaped variant of the exact-Jaccard pipeline
    (cf. dedup_ngram_jaccard_allpairs_smallcorpus): shingles with
    document frequency > 20 are dropped from CANDIDATE GENERATION
    (frequent-item cut, kills the O(df²) hot-shingle bucket), then
    candidates are verified with exact Jaccard over the full shingle
    sets. The oracle SQL implements the identical cap, so this path
    is hash-checked end-to-end, not approximated."""
    return dedup.ngram_jaccard_pairs(
        load(spark, sf_dir, "documents"), threshold=0.3, max_df=20
    )


_SIMHASH_SUMS = ",\n           ".join(
    f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}"
    for i in range(64)
)
_SIMHASH_FP = " + ".join(
    f"(CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(63)
) + f" + (CASE WHEN s63 > 0 THEN {-(1 << 63)} ELSE 0 END)"


@q(
    "simhash_fingerprints_portable",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                        x -> x <> '')) AS tok
      FROM documents WHERE doc_id < 200
    ), h AS (
      SELECT doc_id, md5_number_lower(tok) AS h FROM tok
    ), s AS (
      SELECT doc_id, {_SIMHASH_SUMS}
      FROM h GROUP BY doc_id
    )
    SELECT doc_id, CAST({_SIMHASH_FP} AS BIGINT) AS simhash64 FROM s
    """,
)
def simhash_fingerprints_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined SimHash fingerprints (dedup.simhash_portable):
    the md5-low-64 bit source makes the 64-bit fingerprint itself —
    not just pair verdicts — reproducible cross-engine, so the oracle
    recomputes it from SQL and hash-matches. (dedup_simhash keeps the
    xxhash64 fast path for pair generation; this is the verifiable
    twin.)"""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return dedup.simhash_portable(d)


@q(
    "dedup_simhash",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                        x -> x <> '')) AS tok
      FROM documents
    ), h AS (
      SELECT doc_id, md5_number_lower(tok) AS h FROM tok
    ), s AS (
      SELECT doc_id, {_SIMHASH_SUMS}
      FROM h GROUP BY doc_id
    ), fp AS (
      SELECT doc_id, CAST({_SIMHASH_FP} AS BIGINT) AS simhash64 FROM s
    ), chunks AS (
      SELECT doc_id, simhash64, i AS chunk,
             (simhash64 >> (16 * i)) & 65535 AS val
      FROM fp, UNNEST(range(0, 4)) AS u(i)
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash64, b.simhash64)) AS INTEGER) AS hamming
    FROM chunks a
    JOIN chunks b ON a.chunk = b.chunk AND a.val = b.val
                 AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash64, b.simhash64)) <= 8
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs on the PORTABLE (md5 bit-source)
    fingerprint so the DuckDB oracle reproduces fingerprints — and
    therefore pair verdicts — bit-for-bit. The xxhash64 fast path
    stays available as dedup.simhash_near_dup_pairs(portable=False)
    for engine-internal passes where cross-system reproducibility
    isn't needed (bench-only; not oracle-checkable by design).
    max_hamming=8 over 4 chunks is a DELIBERATE recall-lossy screen
    (allow_lossy=True); the oracle replicates the bucketing, so the
    lossy candidate set itself is what's pinned."""
    return dedup.simhash_near_dup_pairs(
        load(spark, sf_dir, "documents"),
        max_hamming=8,
        portable=True,
        allow_lossy=True,
    )


# perceptual-hash oracle terms: dHash bit j (row r=j//8, col c=j%8)
# compares stub pixels p[r*9+c] and p[r*9+c+1] (1-based in SQL lists);
# aHash bit i is the integer-exact mean test 64*q[i] > Σq. Bit 63 is
# the two's-complement add of -(2^63) — the SimHash convention, so
# fingerprints are plain signed BIGINTs on both engines.
_DHASH_TERMS = " + ".join(
    f"(CASE WHEN p[{(j // 8) * 9 + (j % 8) + 1}] > "
    f"p[{(j // 8) * 9 + (j % 8) + 2}] THEN {1 << j} ELSE 0 END)"
    for j in range(63)
) + f" + (CASE WHEN p[71] > p[72] THEN {-(1 << 63)} ELSE 0 END)"
_AHASH_TERMS = " + ".join(
    f"(CASE WHEN 64 * q[{i + 1}] > qs THEN {1 << i} ELSE 0 END)"
    for i in range(63)
) + f" + (CASE WHEN 64 * q[64] > qs THEN {-(1 << 63)} ELSE 0 END)"

# the decode-stub pixel lists in SQL: pixel i = byte (i*stride mod n)
# of the payload. The phash entries SANITIZE the text to printable
# ASCII plus a '.' sentinel on BOTH engines before building the
# payload (regexp_replace('[^ -~]') || '.'), so ascii(char k) == byte
# k holds by construction — robust to any future non-ASCII fixture
# corpus, and the sentinel keeps the modulo base nonzero for texts
# that sanitize to empty
_DHASH_PX = """
         list_transform(range(0, 72),
           i -> ascii(substr(text,
                CAST((i * 7919) % length(text) AS INTEGER) + 1, 1))) AS p
"""
_PHASH_PX = _DHASH_PX + """,
         list_transform(range(0, 64),
           i -> ascii(substr(text,
                CAST((i * 104729) % length(text) AS INTEGER) + 1, 1))) AS q
"""


@q(
    "simhash_dup_groups",
    f"""
    WITH RECURSIVE tok AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                        x -> x <> '')) AS tok
      FROM documents
    ), h AS (
      SELECT doc_id, md5_number_lower(tok) AS h FROM tok
    ), s AS (
      SELECT doc_id, {_SIMHASH_SUMS}
      FROM h GROUP BY doc_id
    ), fp AS (
      SELECT doc_id, CAST({_SIMHASH_FP} AS BIGINT) AS simhash64 FROM s
    ), good AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM fp a JOIN fp b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash64, b.simhash64)) <= 3
    ), edges AS (
      SELECT id_a AS v, id_b AS n FROM good
      UNION
      SELECT id_b AS v, id_a AS n FROM good
    ), walk(v, c) AS (
      SELECT v, v FROM (SELECT DISTINCT v FROM edges) t
      UNION
      SELECT e.v, w.c FROM edges e JOIN walk w ON w.v = e.n
    ), comp AS (
      SELECT v, MIN(c) AS component FROM walk GROUP BY v
    )
    SELECT d.doc_id,
           COALESCE(c.component, d.doc_id) AS group_id,
           COALESCE(c.component, d.doc_id) = d.doc_id AS is_canonical
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.v
    """,
)
def simhash_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup GROUPS: connected components over the
    portable-fingerprint pigeonhole pairs at Hamming ≤ 3 — the
    distance where 4×16-bit bucketing is recall-EXACT (fewer
    differing bits than chunks ⟹ ≥1 identical chunk), which is what
    lets the oracle close over the ALL-PAIRS Hamming relation while
    Spark only ever joins within chunk buckets. pair_mode="star": CC
    needs only a connectivity-equivalent edge set, so exact-dup
    fingerprint groups contribute K−1 edges, never C(K,2) (see
    dedup_groups). group_id = min doc_id, singletons their own
    group."""
    return _simhash_dup_groups_impl(spark, sf_dir, portable=True)


def _simhash_dup_groups_impl(
    spark: SparkSession, sf_dir: str, portable: bool
) -> DataFrame:
    """Shared pipeline for the registry entry (portable=True, md5 bit
    source, oracle-checkable) and the bench-only hot-path twin
    (portable=False, xxhash64 — one JVM hash per token instead of 8
    hex parses; what a real engine-internal pass runs). The twins are
    NOT group-identical on near-dups: hamming between two different
    texts depends on the bit source, so each hash admits/drops
    different borderline pairs (measured at sf0.001: 60 grouped
    vertices portable vs 46 fast). Identical-TEXT docs always share a
    group under either hash (hamming 0) — pinned in
    tests/test_fp_wide.py."""
    from datasette_upload_csvs_spark.operators import graph

    docs = load(spark, sf_dir, "documents")
    pairs = dedup.simhash_near_dup_pairs(
        docs, max_hamming=3, portable=portable, pair_mode="star"
    ).select("id_a", "id_b")
    cc = graph.connected_components(pairs)
    return (
        docs.select("doc_id")
        .join(cc, F.col("doc_id") == F.col("vertex"), "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("group_id"),
            (F.coalesce("component", "doc_id") == F.col("doc_id")).alias(
                "is_canonical"
            ),
        )
    )


# 128-bit SimHash oracle terms: word0 = md5_number_lower (hex bytes
# 8..15 little-endian, the existing portable convention), word1 =
# md5_number_upper (hex bytes 0..7) — ONE md5 per token covers both
# words on both engines. Sign sums s{w}_{i}; fingerprints are two
# signed BIGINTs with the shared bit-63 two's-complement convention.
_SIMHASH128_SUMS = ",\n           ".join(
    f"SUM(CASE WHEN (h{w} >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{w}_{i}"
    for w in range(2)
    for i in range(64)
)


def _simhash128_fp_sql(w: int) -> str:
    return " + ".join(
        f"(CASE WHEN s{w}_{i} > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(63)
    ) + f" + (CASE WHEN s{w}_63 > 0 THEN {-(1 << 63)} ELSE 0 END)"


@q(
    "simhash128_fingerprints",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                        x -> x <> '')) AS tok
      FROM documents WHERE doc_id < 200
    ), h AS (
      SELECT doc_id, md5_number_lower(tok) AS h0,
             md5_number_upper(tok) AS h1
      FROM tok
    ), s AS (
      SELECT doc_id, {_SIMHASH128_SUMS}
      FROM h GROUP BY doc_id
    )
    SELECT doc_id, CAST({_simhash128_fp_sql(0)} AS BIGINT) AS fp0,
           CAST({_simhash128_fp_sql(1)} AS BIGINT) AS fp1
    FROM s
    """,
)
def simhash128_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """128-bit portable SimHash (dedup.simhash128): two 64-bit words
    from ONE md5 per token (md5_number_lower / md5_number_upper),
    reproducible bit-for-bit cross-engine — the oracle recomputes
    both words from SQL built-ins and hash-matches the fingerprints
    themselves. This is the scale-regime fingerprint: at the same
    n_chunks the pigeonhole keys are twice as wide (4×32-bit), which
    keeps the hamming ≤ 3 join selective past 10⁹ docs where 64-bit
    keys densify quadratic (multi-index-hashing sizing: chunk bits ≳
    log2 n)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return dedup.simhash128(d)


# 256-bit terms: digest 0 = md5(tok) (words 0/1, the simhash128
# convention), digest 1 = md5('w1:' || tok) (words 2/3)
_SIMHASH256_SUMS = ",\n           ".join(
    f"SUM(CASE WHEN (h{w} >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{w}_{i}"
    for w in range(4)
    for i in range(64)
)


@q(
    "simhash256_fingerprints",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                        x -> x <> '')) AS tok
      FROM documents WHERE doc_id < 200
    ), h AS (
      SELECT doc_id,
             md5_number_lower(tok) AS h0,
             md5_number_upper(tok) AS h1,
             md5_number_lower('w1:' || tok) AS h2,
             md5_number_upper('w1:' || tok) AS h3
      FROM tok
    ), s AS (
      SELECT doc_id, {_SIMHASH256_SUMS}
      FROM h GROUP BY doc_id
    )
    SELECT doc_id, CAST({_simhash128_fp_sql(0)} AS BIGINT) AS fp0,
           CAST({_simhash128_fp_sql(1)} AS BIGINT) AS fp1,
           CAST({_simhash128_fp_sql(2)} AS BIGINT) AS fp2,
           CAST({_simhash128_fp_sql(3)} AS BIGINT) AS fp3
    FROM s
    """,
)
def simhash256_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """256-bit portable SimHash (dedup.simhash_wide, n_words=4): the
    RADIUS-scale fingerprint — exact pigeonhole recall at the
    hamming ≤ 7 thresholds fingerprint practice uses needs 8 chunks,
    and 8 chunks keep selective 32-bit keys only at 256-bit width
    (64-bit/8-chunk keys are 8 bits — dense at any corpus size).
    Two md5 digests per token (digest 1 salted 'w1:'), each word
    recomputed in SQL and hash-matched — the same cross-engine
    contract as simhash128_fingerprints, one width up. The bucketed
    join at this width is pinned brute-force-equal in
    tests/test_fp_wide.py::test_simhash_wide_radius7_exact_at_256_bits."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return dedup.simhash_wide(d, n_words=4, portable=True)


@q(
    "simhash128_dup_groups",
    f"""
    WITH RECURSIVE tok AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                        x -> x <> '')) AS tok
      FROM documents
    ), h AS (
      SELECT doc_id, md5_number_lower(tok) AS h0,
             md5_number_upper(tok) AS h1
      FROM tok
    ), s AS (
      SELECT doc_id, {_SIMHASH128_SUMS}
      FROM h GROUP BY doc_id
    ), fp AS (
      SELECT doc_id, CAST({_simhash128_fp_sql(0)} AS BIGINT) AS fp0,
             CAST({_simhash128_fp_sql(1)} AS BIGINT) AS fp1
      FROM s
    ), good AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM fp a JOIN fp b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.fp0, b.fp0))
          + bit_count(xor(a.fp1, b.fp1)) <= 3
    ), edges AS (
      SELECT id_a AS v, id_b AS n FROM good
      UNION
      SELECT id_b AS v, id_a AS n FROM good
    ), walk(v, c) AS (
      SELECT v, v FROM (SELECT DISTINCT v FROM edges) t
      UNION
      SELECT e.v, w.c FROM edges e JOIN walk w ON w.v = e.n
    ), comp AS (
      SELECT v, MIN(c) AS component FROM walk GROUP BY v
    )
    SELECT d.doc_id,
           COALESCE(c.component, d.doc_id) AS group_id,
           COALESCE(c.component, d.doc_id) = d.doc_id AS is_canonical
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.v
    """,
)
def simhash128_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup GROUPS over the 128-bit SimHash tier — the large-n
    regime of simhash_dup_groups. Hamming ≤ 3 over the concatenated
    128 bits, bucketed by 4×32-BIT pigeonhole chunks
    (fingerprint_hamming_pairs_wide): recall stays EXACT (fewer
    differing bits than chunks ⟹ ≥1 identical chunk, at any width)
    while the candidate mass on a dup-free corpus drops from
    4·n²/2¹⁶ to 4·n²/2³² — sub-quadratic out past 10⁹ docs, measured
    in BENCH_FP_SCALE.json. The oracle closes over the all-pairs
    128-bit Hamming relation, valid for the same exactness reason.
    pair_mode="star" keeps dup-mass output linear (see
    dedup_groups)."""
    from datasette_upload_csvs_spark.operators import graph

    docs = load(spark, sf_dir, "documents")
    fp = dedup.simhash128(docs)
    pairs = dedup.fingerprint_hamming_pairs_wide(
        fp, ["fp0", "fp1"], "doc_id", max_hamming=3, pair_mode="star"
    ).select("id_a", "id_b")
    cc = graph.connected_components(pairs)
    return (
        docs.select("doc_id")
        .join(cc, F.col("doc_id") == F.col("vertex"), "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("group_id"),
            (F.coalesce("component", "doc_id") == F.col("doc_id")).alias(
                "is_canonical"
            ),
        )
    )


@q(
    "multimodal_dup_groups",
    f"""
    WITH RECURSIVE base AS (
      SELECT doc_id AS media_id,
             regexp_replace(text, '[^ -~]', '', 'g') || '.' AS text
      FROM documents
      UNION ALL
      SELECT doc_id + 10000000,
             regexp_replace(text, '[^ -~]', '', 'g') || '.'
      FROM documents WHERE doc_id % 5 = 0
    ), px AS (
      SELECT media_id,
{_DHASH_PX}
      FROM base
    ), fp AS (
      SELECT media_id, CAST({_DHASH_TERMS} AS BIGINT) AS f FROM px
    ), good AS (
      SELECT a.media_id AS id_a, b.media_id AS id_b
      FROM fp a JOIN fp b ON a.media_id < b.media_id
      WHERE bit_count(xor(a.f, b.f)) <= 2
    ), edges AS (
      SELECT id_a AS v, id_b AS n FROM good
      UNION
      SELECT id_b AS v, id_a AS n FROM good
    ), walk(v, c) AS (
      SELECT v, v FROM (SELECT DISTINCT v FROM edges) t
      UNION
      SELECT e.v, w.c FROM edges e JOIN walk w ON w.v = e.n
    ), comp AS (
      SELECT v, MIN(c) AS component FROM walk GROUP BY v
    )
    SELECT b.media_id,
           COALESCE(c.component, b.media_id) AS group_id,
           COALESCE(c.component, b.media_id) = b.media_id AS is_canonical
    FROM base b LEFT JOIN comp c ON b.media_id = c.v
    """,
)
def multimodal_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload duplicate GROUPS: perceptual dHash → pigeonhole
    pairs at Hamming ≤ 2 (recall-exact bucketing, so the all-pairs
    SQL closure is a valid oracle) → connected components, over the
    planted-twin corpus (every 5th payload duplicated) so each twin
    lands in its base's group. The image-corpus form of dedup_groups;
    pair_mode="star" keeps the edge set linear in dup mass."""
    from datasette_upload_csvs_spark.operators import graph, multimodal

    media = _ascii_media(spark, sf_dir)
    twins = media.filter(F.pmod("media_id", F.lit(5)) == 0).withColumn(
        "media_id", F.col("media_id") + F.lit(10_000_000)
    )
    corpus = media.unionByName(twins)
    fp = multimodal.perceptual_hashes(corpus).select("media_id", "dhash64")
    pairs = dedup.fingerprint_hamming_pairs(
        fp, "dhash64", "media_id", max_hamming=2, pair_mode="star"
    ).select("id_a", "id_b")
    cc = graph.connected_components(pairs)
    return (
        corpus.select("media_id")
        .join(cc, F.col("media_id") == F.col("vertex"), "left")
        .select(
            "media_id",
            F.coalesce("component", "media_id").alias("group_id"),
            (F.coalesce("component", "media_id") == F.col("media_id")).alias(
                "is_canonical"
            ),
        )
    )


@q(
    "dedup_embedding_cosine",
    """
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), anchors AS (
      SELECT vec_id AS anchor_id, v AS av FROM v WHERE vec_id < 64
    ), scored AS (
      SELECT x.vec_id, a.anchor_id,
             list_sum(list_transform(range(1, len(x.v) + 1),
                      i -> x.v[i] * a.av[i]))
               / (sqrt(list_sum(list_transform(x.v, e -> e * e)))
                  * sqrt(list_sum(list_transform(a.av, e -> e * e)))) AS ac
      FROM v x CROSS JOIN anchors a
    ), assign AS (
      SELECT vec_id, anchor_id FROM (
        SELECT vec_id, anchor_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY ac DESC, anchor_id ASC) AS rn
        FROM scored
      ) WHERE rn <= 6
    ), cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM assign a JOIN assign b
        ON a.anchor_id = b.anchor_id AND a.vec_id < b.vec_id
    ), p AS (
      SELECT c.id_a, c.id_b,
             list_sum(list_transform(range(1, len(x.v) + 1),
                      i -> x.v[i] * y.v[i]))
               / (sqrt(list_sum(list_transform(x.v, e -> e * e)))
                  * sqrt(list_sum(list_transform(y.v, e -> e * e)))) AS cos_raw
      FROM cand c JOIN v x ON x.vec_id = c.id_a
                  JOIN v y ON y.vec_id = c.id_b
    )
    SELECT id_a, id_b, round(cos_raw, 6) AS cos_sim
    FROM p WHERE cos_raw >= 0.35
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs on BUCKETED candidates: anchor
    blocking (top-6 of the 64 smallest-id vectors as anchors — the
    deterministic, cross-engine-reproducible stand-in for a k-means
    coarse quantizer), candidate pairs share an anchor via a bucket
    equi-join, exact cosine ≥ 0.35 verifies. The oracle reproduces
    the identical anchor assignment, so the pair set is pinned. The
    all-pairs exact form (previous registration) remains as
    dedup.embedding_near_dup_pairs — the recall baseline; its
    BroadcastNestedLoopJoin over n² pairs is exactly what this entry
    replaces for corpus scale."""
    return dedup.embedding_anchor_block_pairs(
        load(spark, sf_dir, "embeddings"), threshold=0.35
    )


# ====================================================================
# B38 — similarity search
# ====================================================================


@q(
    "similarity_topk_bruteforce",
    """
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id = 0
    ), scored AS (
      SELECT q.query_id, a.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, len(a.v) + 1),
                      i -> a.v[i] * q.qv[i]))
               / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
                  * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS cos_raw
      FROM v a CROSS JOIN q
      WHERE a.vec_id <> 0
    )
    SELECT query_id, neighbor_id, round(cos_raw, 6) AS cos_sim
    FROM scored
    ORDER BY cos_raw DESC, neighbor_id ASC
    LIMIT 10
    """,
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.brute_force_topk(
        load(spark, sf_dir, "embeddings"), query_id=0, k=10
    )


# Shared CTE chain for the two cluster-consuming queries: exact-Jaccard
# ≥ 0.7 edges (all pairs sharing ≥1 shingle, exact counts), then
# recursive-CTE transitive closure. The Spark side generates the SAME
# edge set sub-quadratically: MinHash+LSH banded candidates UNION the
# low-df candidate floor (exact_floor_max_df, see
# dedup.minhash_near_dup_pairs), then one exact verify — no false
# positives ever, and the two candidate sources cover each other's
# blind spot: near-threshold pairs live in small clusters whose
# shared shingles have df ≤ floor cap (floored deterministically),
# while pairs sharing only hotter shingles sit at j ≈ 1 where band
# collision is essentially certain. On the test corpus the floor
# alone already contains every exact pair (planted dup clusters are
# small, shared shingles df ≤ 3); LSH alone would carry a ~1.5e-4
# per-borderline-pair recall gap against this exact oracle.
# exact 3-gram Jaccard ≥ 0.7 edge set — the shared oracle spec every
# cluster-/pair-consuming twin builds on (the Spark side is the
# verified MinHash pipeline; pair-set equality is what the gate pins)
_EDGE_CTES_BODY = f"""toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                 x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, UNNEST(range(1, greatest(len(t) - 1, 2))) AS u(i)
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), pr AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), good AS (
      SELECT id_a, id_b
      FROM pr JOIN sizes sa ON id_a = sa.doc_id
              JOIN sizes sb ON id_b = sb.doc_id
      WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.7
    )"""

_CLUSTER_CTES = """
    WITH RECURSIVE """ + _EDGE_CTES_BODY + """, edges AS (
      SELECT id_a AS v, id_b AS n FROM good
      UNION
      SELECT id_b AS v, id_a AS n FROM good
    ), walk(v, c) AS (
      SELECT v, v FROM (SELECT DISTINCT v FROM edges) t
      UNION
      SELECT e.v, w.c FROM edges e JOIN walk w ON w.v = e.n
    ), comp AS (
      SELECT v, MIN(c) AS component FROM walk GROUP BY v
    )
"""

# df cap for the EXACT (non-LSH) capped shingle paths that still need
# it: dedup_containment, dedup_ngram_jaccard_capped, incremental splits
_CLUSTER_MAX_DF = 20

# df cap for the deterministic LSH candidate FLOOR (see
# dedup.minhash_near_dup_pairs): small by design — the floor covers
# the small-cluster near-threshold regime (shared content shingles
# have df ~ cluster size), LSH covers everything hotter at j -> 1
# where band collision is essentially certain.
_FLOOR_MAX_DF = 5


@q(
    "dedup_groups",
    _CLUSTER_CTES
    + """
    SELECT d.doc_id,
           COALESCE(c.component, d.doc_id) AS group_id,
           COALESCE(c.component, d.doc_id) = d.doc_id AS is_canonical
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.v
    """,
)
def dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup PAIRS → duplicate GROUPS via distributed connected
    components (operators/graph.py, hash-min label propagation): if
    A~B and B~C then {A,B,C} is one cluster even though (A,C) was
    never emitted. group_id = min doc_id of the cluster (the keeper
    convention), singletons are their own group.

    Edges come from the MinHash+LSH pipeline (banded signature
    candidates + exact-Jaccard verify) — sub-quadratic candidate
    generation with NO shingle-frequency failure mode: a boilerplate
    shingle present in df documents never creates an O(df²) bucket
    because candidates come from signature bands, not shingle
    buckets. This is the 100 TB recipe (round-4 verdict's preferred
    fix over the max_df cap). Because the oracle is the EXACT edge
    closure, the low-df candidate floor is unioned in
    (exact_floor_max_df=5) — edge-set equality is structural, not
    LSH-recall-probabilistic (the floor and the bands cover each
    other's blind spot, see minhash_near_dup_pairs), and still
    sub-quadratic (bounded C(df,2) expansion per low-df shingle).
    Oracle = recursive CTE transitive closure over the exact-Jaccard
    ≥ 0.7 edge set.

    pair_mode="star": CC only needs a connectivity-equivalent edge
    set, so exact-dup groups contribute K−1 rep→member edges instead
    of the C(K,2) clique — identical components (the star and the
    clique have the same transitive closure, see
    dedup.minhash_near_dup_pairs), output linear in dup mass."""
    from datasette_upload_csvs_spark.operators import graph

    docs = load(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_dup_pairs(
        docs, threshold=0.7, exact_floor_max_df=_FLOOR_MAX_DF,
        pair_mode="star",
    ).select(
        "id_a", "id_b"
    )
    cc = graph.connected_components(pairs)
    return (
        docs.select("doc_id")
        .join(cc, F.col("doc_id") == F.col("vertex"), "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("group_id"),
            (F.coalesce("component", "doc_id") == F.col("doc_id")).alias(
                "is_canonical"
            ),
        )
    )


@q(
    "similarity_topk_batch",
    """
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id < 8
    ), scored AS (
      SELECT q.query_id, a.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, len(a.v) + 1),
                      i -> a.v[i] * q.qv[i]))
               / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
                  * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS cos_raw
      FROM v a CROSS JOIN q
      WHERE a.vec_id <> q.query_id
    ), ranked AS (
      SELECT query_id, neighbor_id, cos_raw,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_raw DESC, neighbor_id ASC) AS rk
      FROM scored
    )
    SELECT query_id, neighbor_id, CAST(rk AS INTEGER) AS rank,
           round(cos_raw, 6) AS cos_sim
    FROM ranked WHERE rk <= 10
    """,
)
def similarity_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 for a SET of 8 query vectors in one corpus scan
    (broadcast query set + two-level per-query top-k), not 8
    separate broadcast scans. Oracle = DuckDB brute force over the
    same query set."""
    return similarity.brute_force_topk_batch(
        load(spark, sf_dir, "embeddings"), query_ids=list(range(8)), k=10
    )


@q(
    "similarity_lsh_topk_batch",
    "SELECT CAST(8 AS BIGINT) AS n_queries, TRUE AS recall_ok",
)
def similarity_lsh_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-join batch ANN: every query's candidates come from
    LSH bucket proximity, scored in one join. Gate: mean recall@10
    vs the exact batch ≥ 30% (5 planes / Hamming-2 multiprobe
    measures 0.57–0.75 across sf0.001–sf0.1 — the intrinsic ceiling
    of data-INDEPENDENT sign-random-projection when true neighbors
    sit near the random-pair cosine background; the ≥0.9-recall
    bucketed path is similarity_anchor_topk_batch)."""
    emb = load(spark, sf_dir, "embeddings")
    qids = list(range(8))
    exact = similarity.brute_force_topk_batch(emb, qids, 10).select(
        "query_id", "neighbor_id"
    )
    approx = similarity.lsh_topk_batch(
        emb, qids, 10, n_planes=5, probe_hamming=2
    ).select("query_id", "neighbor_id")
    hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
    total = exact.count()
    return spark.createDataFrame(
        [(len(qids), total > 0 and hits / total >= 0.30)],
        "n_queries long, recall_ok boolean",
    )


@q(
    "similarity_anchor_topk_batch",
    "SELECT CAST(8 AS BIGINT) AS n_queries, TRUE AS recall_ok, TRUE AS pruned",
)
def similarity_anchor_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship bucketed batch ANN: anchor-cell probing (IVF with
    deterministic anchors; similarity.anchor_topk_batch). Gate:
    mean recall@10 vs the exact batch ≥ 0.9 AND the candidate set
    is a strict subset of the corpus (measured 0.92-1.00 recall at
    ~25% candidate fraction across sf0.001-sf0.1 — vs the 0.57-0.75
    ceiling of sign-random-projection LSH on this corpus)."""
    emb = load(spark, sf_dir, "embeddings")
    qids = list(range(8))
    exact = similarity.brute_force_topk_batch(emb, qids, 10).select(
        "query_id", "neighbor_id"
    )
    approx = similarity.anchor_topk_batch(emb, qids, 10).select(
        "query_id", "neighbor_id"
    )
    hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
    total = exact.count()
    # pruning proof: candidates scored per query < half the corpus
    n = emb.count()
    cand_rows = similarity.anchor_topk_batch(
        emb, qids, k=n, probe_corpus=3, probe_query=6
    ).count()
    return spark.createDataFrame(
        [
            (
                len(qids),
                total > 0 and hits / total >= 0.9,
                cand_rows < len(qids) * n // 2,
            )
        ],
        "n_queries long, recall_ok boolean, pruned boolean",
    )


@q(
    "similarity_anchor_topk_results",
    """
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), anchors AS (
      SELECT vec_id AS anchor_id, v AS av FROM v WHERE vec_id < 64
    ), scored_anchors AS (
      SELECT x.vec_id, a.anchor_id,
             list_sum(list_transform(range(1, len(x.v) + 1),
                      i -> x.v[i] * a.av[i]))
               / (sqrt(list_sum(list_transform(x.v, e -> e * e)))
                  * sqrt(list_sum(list_transform(a.av, e -> e * e)))) AS ac
      FROM v x CROSS JOIN anchors a
    ), ranked AS (
      SELECT vec_id, anchor_id,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY ac DESC, anchor_id ASC) AS rn
      FROM scored_anchors
    ), corpus_cells AS (
      SELECT vec_id, anchor_id FROM ranked WHERE rn <= 3
    ), query_cells AS (
      SELECT vec_id AS query_id, anchor_id FROM ranked
      WHERE vec_id < 8 AND rn <= 6
    ), cand AS (
      SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
      FROM corpus_cells c JOIN query_cells q ON c.anchor_id = q.anchor_id
      WHERE c.vec_id <> q.query_id
    ), scored AS (
      SELECT cd.query_id, cd.neighbor_id,
             list_sum(list_transform(range(1, len(x.v) + 1),
                      i -> x.v[i] * y.v[i]))
               / (sqrt(list_sum(list_transform(x.v, e -> e * e)))
                  * sqrt(list_sum(list_transform(y.v, e -> e * e)))) AS cos_raw
      FROM cand cd JOIN v x ON x.vec_id = cd.neighbor_id
                   JOIN v y ON y.vec_id = cd.query_id
    ), final AS (
      SELECT query_id, neighbor_id, cos_raw,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_raw DESC, neighbor_id ASC) AS rk
      FROM scored
    )
    SELECT query_id, neighbor_id, CAST(rk AS INTEGER) AS rank,
           round(cos_raw, 6) AS cos_sim
    FROM final WHERE rk <= 10
    """,
)
def similarity_anchor_topk_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The anchor-cell batch ANN RESULT SET (8 queries × top-10),
    hash-checked: anchor assignment is deterministic on any engine,
    so unlike k-means-based ANN the approximate neighbor lists
    themselves are oracle-reproducible, not just a recall verdict.
    This is the benchable form of similarity_anchor_topk_batch's
    gate (which additionally runs the exact baseline to measure
    recall)."""
    return similarity.anchor_topk_batch(
        load(spark, sf_dir, "embeddings"), query_ids=list(range(8)), k=10
    )


@q(
    "similarity_ivf_recall",
    "SELECT CAST(0 AS BIGINT) AS query_id, TRUE AS recall_ok",
)
def similarity_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (k-means inverted lists, FAISS-IVF-Flat shape) vs exact
    top-10: must recover ≥ 50% probing 8/16 clusters. Clustering is
    seeded but k-means init isn't bit-stable across environments, so
    the oracle pins the recall verdict, not the neighbor set."""
    emb = load(spark, sf_dir, "embeddings")
    exact = similarity.brute_force_topk(emb, 0, 10).select("neighbor_id")
    approx = similarity.ivf_topk(emb, 0, 10, n_probe=8).select("neighbor_id")
    hit = exact.join(approx, "neighbor_id", "left_semi").count()
    return spark.createDataFrame(
        [(0, hit >= 5)], "query_id long, recall_ok boolean"
    )


@q(
    "similarity_lsh_recall",
    "SELECT CAST(0 AS BIGINT) AS query_id, TRUE AS recall_ok",
)
def similarity_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic LSH-vs-exact recall gate: the LSH top-k (single
    bucket probe) must recover ≥ 30% of the exact top-10. The sketch
    is engine-specific so the oracle pins only the verdict."""
    rec = similarity.recall_vs_brute_force(
        load(spark, sf_dir, "embeddings"), query_id=0, k=10, n_planes=4
    )
    return rec.select(
        "query_id", (F.col("recall") >= 0.3).alias("recall_ok")
    )


# ====================================================================
# B39 — text analysis
# ====================================================================


@q(
    "text_token_stats",
    f"""
    WITH toks AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(text, '{SPLIT_RE}'),
                         x -> x <> '') AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(length(text) AS INTEGER) AS n_chars,
           CAST(len(t) AS INTEGER) AS n_tokens,
           CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
             / greatest(len(t), 1) AS avg_token_len
    FROM toks
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.token_stats(load(spark, sf_dir, "documents"))


@q(
    "text_word_freq",
    f"""
    SELECT word, COUNT(*) AS freq
    FROM (SELECT unnest(list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                    x -> x <> '')) AS word
          FROM documents)
    GROUP BY word
    ORDER BY freq DESC, word ASC
    LIMIT 20
    """,
)
def text_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.word_frequencies(load(spark, sf_dir, "documents"), top_n=20)


_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


@q(
    "text_quality",
    f"""
    WITH toks AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(text, '{SPLIT_RE}'),
                         x -> x <> '') AS t
      FROM documents
    ), m AS (
      SELECT doc_id,
             CAST(len(t) AS INTEGER) AS n_tokens,
             CAST(len(list_filter(t, x -> list_contains([{_STOP_SQL}], x)))
                  AS DOUBLE) / greatest(len(t), 1) AS stop_ratio,
             CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
                  AS DOUBLE) / greatest(length(text), 1) AS punct_ratio,
             len(t) BETWEEN 5 AND 100000 AS length_ok
      FROM toks
    )
    SELECT doc_id, n_tokens,
           round(stop_ratio, 6) AS stopword_ratio,
           round(punct_ratio, 6) AS punct_ratio,
           round(CASE WHEN length_ok THEN 0.5 ELSE 0.0 END
                 + least(stop_ratio * 2.0, 0.3)
                 + CASE WHEN punct_ratio <= 0.1 THEN 0.2 ELSE 0.0 END, 6)
             AS quality_score
    FROM m
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.quality_scores(load(spark, sf_dir, "documents"))


@q(
    "dedup_keep_best",
    _CLUSTER_CTES.rstrip()
    + f""", qual AS (
      SELECT doc_id,
             round(CASE WHEN len(t) BETWEEN 5 AND 100000
                        THEN 0.5 ELSE 0.0 END
                   + least(2.0 * CAST(len(list_filter(t,
                         x -> list_contains([{_STOP_SQL}], x))) AS DOUBLE)
                       / greatest(len(t), 1), 0.3)
                   + CASE WHEN CAST(length(text)
                              - length(regexp_replace(text, '[.,!?;:]',
                                                      '', 'g')) AS DOUBLE)
                              / greatest(length(text), 1) <= 0.1
                          THEN 0.2 ELSE 0.0 END, 6) AS q
      FROM toks JOIN documents USING (doc_id)
    ), assigned AS (
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS group_id
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.v
    ), ranked AS (
      SELECT a.doc_id, a.group_id, q.q,
             ROW_NUMBER() OVER (PARTITION BY a.group_id
                                ORDER BY q.q DESC, a.doc_id) AS rk
      FROM assigned a JOIN qual q ON a.doc_id = q.doc_id
    )
    SELECT doc_id, group_id, q AS quality_score, rk = 1 AS is_keeper
    FROM ranked
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-canonical cluster dedup: the keeper of each near-dup
    cluster is the HIGHEST-QUALITY member (ties → min doc_id), not
    the min-id — what a real curation pipeline keeps (dedup_groups'
    min-id convention is the audit view; this is the selection view).
    Clusters come from the same banded MinHash edge pipeline; the
    rank is a window partitioned by group_id — near-dup clusters are
    small by construction (LSH bucket caps), so the window never sees
    a hot partition. Ranking uses the ROUNDED quality score on both
    engines so sub-ulp double drift can't flip a tie. pair_mode=
    "star": CC consumes a connectivity-equivalent edge set, linear
    in dup mass (see dedup_groups)."""
    from datasette_upload_csvs_spark.operators import graph

    docs = load(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_dup_pairs(
        docs, threshold=0.7, exact_floor_max_df=_FLOOR_MAX_DF,
        pair_mode="star",
    ).select(
        "id_a", "id_b"
    )
    cc = graph.connected_components(pairs)
    assigned = (
        docs.select("doc_id")
        .join(cc, F.col("doc_id") == F.col("vertex"), "left")
        .select(
            "doc_id", F.coalesce("component", "doc_id").alias("group_id")
        )
    )
    qual = textstats.quality_scores(docs).select("doc_id", "quality_score")
    w = Window.partitionBy("group_id").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    return (
        assigned.join(qual, "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .select(
            "doc_id",
            "group_id",
            "quality_score",
            (F.col("rk") == 1).alias("is_keeper"),
        )
    )


_LANG_COUNTS_SQL = ",\n             ".join(
    "CAST(len(list_filter(t, x -> list_contains(["
    + ", ".join(f"'{w}'" for w in words)
    + f"], x))) AS INTEGER) AS hits_{lang}"
    for lang, words in textstats.LANG_MARKERS.items()
)


@q(
    "text_lang_id",
    f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '{SPLIT_RE}'),
                         x -> x <> '') AS t
      FROM documents
    ), counts AS (
      SELECT doc_id,
             {_LANG_COUNTS_SQL}
      FROM toks
    )
    SELECT doc_id,
           CASE WHEN hits_en >= greatest(hits_de, hits_fr, hits_es, 1) THEN 'en'
                WHEN hits_de >= greatest(hits_fr, hits_es, 1) THEN 'de'
                WHEN hits_fr >= greatest(hits_es, 1) THEN 'fr'
                WHEN hits_es >= 1 THEN 'es'
                ELSE 'und' END AS predicted_lang,
           hits_en, hits_de, hits_fr, hits_es
    FROM counts
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.language_id(load(spark, sf_dir, "documents"))


@q(
    "text_fingerprint",
    f"""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
             list_filter(string_split_regex(lower(text), '{SPLIT_RE}'),
                         x -> x <> ''))), ' ')) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.fingerprints(load(spark, sf_dir, "documents"))


@q(
    "text_tfidf_top_terms",
    f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                 x -> x <> '') AS t
      FROM documents
    ), tf AS (
      SELECT doc_id, word, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(t) AS word FROM toks)
      GROUP BY doc_id, word
    ), df AS (
      SELECT word, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY word
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, word, round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
    FROM tf JOIN df USING (word) CROSS JOIN n
    WHERE doc_id < 5
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf as a relational composition (explode → tf agg → df agg
    → join): the classic scale shape — df is a word-keyed aggregate,
    broadcast back; no per-doc state. Output restricted to 5 docs to
    keep the oracle comparison small."""
    from datasette_upload_csvs_spark.functions.text import tokens

    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("word"))
    tf = tok.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()
    return (
        tf.join(F.broadcast(dfreq), "word")
        .filter(F.col("doc_id") < 5)
        .select(
            "doc_id",
            "word",
            F.round(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
            ).alias("tfidf"),
        )
    )


@q(
    "doc_keywords",
    f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                 x -> x <> '') AS t
      FROM documents
    ), tf AS (
      SELECT doc_id, word, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(t) AS word FROM toks)
      GROUP BY doc_id, word
    ), df AS (
      SELECT word, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY word
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, word, tf * ln(CAST(n_docs AS DOUBLE) / df) AS s
      FROM tf JOIN df USING (word) CROSS JOIN n
    ), ranked AS (
      SELECT doc_id, word, s,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY s DESC, word ASC) AS rk
      FROM scored
    )
    SELECT doc_id, word, CAST(rk AS INTEGER) AS rank, round(s, 6) AS tfidf
    FROM ranked WHERE rk <= 3
    """,
)
def doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction: top-3 tf-idf terms PER DOCUMENT across the
    whole corpus — the labeling pass of a curation pipeline. Same
    relational tf-idf as text_tfidf_top_terms, plus a per-doc
    ranking window; the window key is doc_id (millions of small
    groups — distributes evenly, unlike a global sort), with the
    deterministic (score desc, word asc) tiebreak."""
    from datasette_upload_csvs_spark.functions.text import tokens as _toks
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_toks(F.col("text"))).alias("word"))
    tf = tok.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()
    scored = tf.join(F.broadcast(dfreq), "word").select(
        "doc_id",
        "word",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("s"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("s").desc(), F.col("word").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "word", "rank", F.round("s", 6).alias("tfidf"))
    )


@q(
    "text_bigram_freq",
    f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                 x -> x <> '') AS t
      FROM documents
    )
    SELECT bigram, COUNT(*) AS freq
    FROM (SELECT t[i] || ' ' || t[i+1] AS bigram
          FROM toks, UNNEST(range(1, len(t))) AS u(i))
    GROUP BY bigram
    ORDER BY freq DESC, bigram ASC
    LIMIT 20
    """,
)
def text_bigram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram counts (the n-gram LM statistics pass)."""
    from datasette_upload_csvs_spark.functions.text import tokens

    d = load(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    bigrams = F.expr(
        "transform(sequence(1, size(t) - 1), i -> concat(t[i-1], ' ', t[i]))"
    )
    return (
        d.select(t.alias("t"))
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("bigram").asc())
        .limit(20)
    )


@q(
    "stratified_split_counts",
    """
    SELECT lang, split, COUNT(*) AS n_docs
    FROM (SELECT lang,
                 CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                           IN ('0','1','2') THEN 'val' ELSE 'train' END AS split
          FROM documents)
    GROUP BY lang, split
    """,
)
def stratified_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val split, stratified per language —
    hash-keyed on doc_id so the split is stable across runs, engines
    and repartitioning (what df.sample cannot give you)."""
    d = load(spark, sf_dir, "documents")
    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
            "0", "1", "2"
        ),
        "val",
    ).otherwise("train")
    return (
        d.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
    )


@q(
    "contamination_overlap",
    f"""
    WITH fp AS (
      SELECT doc_id, source,
             md5(array_to_string(list_sort(list_distinct(
               list_filter(string_split_regex(lower(text), '{SPLIT_RE}'),
                           x -> x <> ''))), ' ')) AS fingerprint
      FROM documents
    ), test_set AS (
      SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 10 = 0
    )
    SELECT source, COUNT(*) AS n_contaminated
    FROM fp
    WHERE doc_id % 10 <> 0
      AND fingerprint IN (SELECT fingerprint FROM test_set)
    GROUP BY source
    """,
)
def contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination scan: fingerprint both sides, semi-
    join train against the (broadcastable) test fingerprint set —
    the decontamination pass every eval pipeline runs. Near-dup
    variants compose by swapping fingerprints for MinHash buckets."""
    d = load(spark, sf_dir, "documents")
    fp = textstats.fingerprints(d).join(
        d.select("doc_id", "source"), "doc_id"
    )
    test = fp.filter(F.col("doc_id") % 10 == 0).select("fingerprint").distinct()
    return (
        fp.filter(F.col("doc_id") % 10 != 0)
        .join(F.broadcast(test), "fingerprint", "left_semi")
        .groupBy("source")
        .agg(F.count("*").alias("n_contaminated"))
    )


@q(
    "token_count_bpe",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS INTEGER)
             AS n_bpe_tokens
    FROM documents
    """,
)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(TOKEN_RE)).alias("n_bpe_tokens"),
    )


# ====================================================================
# B20 — LIMIT / OFFSET with deterministic order
# ====================================================================


@q(
    "limit_offset",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 10
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(10)
        .limit(20)
    )


# ====================================================================
# B34 — vectorized (Arrow) pandas UDF
# ====================================================================


@q(
    "udf_pandas_vowel_count",
    """
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[aeiou]')) AS BIGINT) AS n_vowels
    FROM documents
    """,
)
def udf_pandas_vowel_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar pandas UDF (the engine's sanctioned slow
    path: vectorized columnar transfer, ~10-100× over row-at-a-time
    Python UDFs). Logic is trivially SQL-mirrorable on purpose so the
    UDF *mechanism* is what the oracle checks."""
    # lambda form: module-level `from __future__ import annotations`
    # would stringify hints and break pandas_udf's signature sniffing
    vowels = F.pandas_udf(
        lambda s: s.str.count("[aeiou]").astype("int64"), "long"
    )
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", vowels("text").alias("n_vowels"))


# ====================================================================
# B35 — grouped custom aggregation via applyInPandas
# ====================================================================


@q(
    "grouped_pandas_zscore",
    """
    SELECT c_custkey, c_mktsegment,
           round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_mktsegment))
                 / stddev_samp(c_acctbal) OVER (PARTITION BY c_mktsegment), 4)
             AS acctbal_z
    FROM customer
    """,
)
def grouped_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group normalization with applyInPandas: each market segment
    arrives as one pandas frame (Arrow), z-scores computed with numpy.
    At scale this shuffles once on the group key — identical shape to
    a built-in window agg, but with arbitrary Python math available."""
    import pandas as pd

    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mean = pdf["c_acctbal"].mean()
        std = pdf["c_acctbal"].std(ddof=1)
        out = pdf[["c_custkey", "c_mktsegment"]].copy()
        out["acctbal_z"] = ((pdf["c_acctbal"] - mean) / std).round(4)
        return out

    return c.groupBy("c_mktsegment").applyInPandas(
        zscore, schema="c_custkey long, c_mktsegment string, acctbal_z double"
    )


# ====================================================================
# B40 — multimodal columns: binary payload + mapInPandas features
# ====================================================================


@q(
    "multimodal_feature_extract",
    """
    SELECT doc_id AS media_id,
           'application/fake' AS mime,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS feat_mean
    FROM documents
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: documents → fake media table (payload =
    utf-8 bytes standing in for an encoded image) → Arrow-batched
    mapInPandas feature extraction. The oracle recomputes the digest
    path in SQL (md5 over the same bytes)."""
    from datasette_upload_csvs_spark.operators import multimodal

    media = multimodal.fake_documents_media(load(spark, sf_dir, "documents"))
    return multimodal.extract_features(media).select(
        "media_id", "mime", "n_bytes", "feat_mean"
    )


@q(
    "multimodal_resize",
    """
    SELECT doc_id AS media_id,
           224 AS width, 224 AS height,
           CAST(6272 AS BIGINT) AS n_bytes,
           md5(md5(text)) AS head_hex
    FROM documents
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing over binary payloads (the vision-encoder
    preprocessing step): mapInPandas in/out on MEDIA_SCHEMA with a
    deterministic fake bitmap (md5 hex chain). The oracle pins the
    output dimensions, exact byte size (224*224/8), and the first
    16-byte block — md5(md5(text)) reproduces the fake decoder's
    first chain step in SQL, so the binary content is cross-engine
    verified, not just its shape."""
    from datasette_upload_csvs_spark.operators import multimodal

    media = multimodal.fake_documents_media(load(spark, sf_dir, "documents"))
    out = multimodal.resize_media(media, 224, 224)
    return out.select(
        "media_id",
        "width",
        "height",
        F.length("payload").cast("bigint").alias("n_bytes"),
        F.lower(F.hex(F.substring("payload", 1, 16))).alias("head_hex"),
    )


def _ascii_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> fake media with the payload built from text
    sanitized to printable ASCII plus a '.' sentinel — the exact
    transform the phash oracles apply, so byte-indexed pixels equal
    char-indexed ascii() on ANY corpus (and never modulo zero)."""
    from datasette_upload_csvs_spark.operators import multimodal

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.regexp_replace("text", "[^ -~]", ""), F.lit(".")
        ).alias("text"),
    )
    return multimodal.fake_documents_media(docs)


@q(
    "multimodal_phash_fingerprints",
    f"""
    WITH clean AS (
      SELECT doc_id AS media_id,
             regexp_replace(text, '[^ -~]', '', 'g') || '.' AS text
      FROM documents
    ), px AS (
      SELECT media_id,
{_PHASH_PX}
      FROM clean
    ), s AS (
      SELECT media_id, p, q, list_sum(q) AS qs FROM px
    )
    SELECT media_id,
           CAST({_DHASH_TERMS} AS BIGINT) AS dhash64,
           CAST({_AHASH_TERMS} AS BIGINT) AS ahash64
    FROM s
    """,
)
def multimodal_phash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image hashing over a binary column: dHash (9×8
    horizontal-gradient signs) + aHash (64-pixel integer-exact mean
    test) computed in one Arrow pass over the payload bytes
    (operators/multimodal.perceptual_hashes). The decode step is the
    deterministic stride-sampling stub (no codecs in this
    environment — with PIL it becomes decode→grayscale→resize, one
    swapped function); the HASH MATH is the real published
    algorithm, and the oracle recomputes both fingerprints from the
    same bytes in SQL, so the bit patterns are cross-engine pinned,
    not just shaped."""
    from datasette_upload_csvs_spark.operators import multimodal

    media = _ascii_media(spark, sf_dir)
    return multimodal.perceptual_hashes(media)


@q(
    "multimodal_near_dup_pairs",
    f"""
    WITH base AS (
      SELECT doc_id AS media_id,
             regexp_replace(text, '[^ -~]', '', 'g') || '.' AS text
      FROM documents
      UNION ALL
      SELECT doc_id + 10000000,
             regexp_replace(text, '[^ -~]', '', 'g') || '.'
      FROM documents WHERE doc_id % 5 = 0
    ), px AS (
      SELECT media_id,
{_DHASH_PX}
      FROM base
    ), fp AS (
      SELECT media_id, CAST({_DHASH_TERMS} AS BIGINT) AS f FROM px
    )
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           CAST(bit_count(xor(a.f, b.f)) AS INTEGER) AS hamming
    FROM fp a JOIN fp b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.f, b.f)) <= 2
    """,
)
def multimodal_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column near-dup pairs: dHash fingerprints over payload
    bytes, then the banded pigeonhole chunk join
    (dedup.fingerprint_hamming_pairs — the SimHash machinery reused
    for a perceptual-hash source) at Hamming ≤ 2, where the 4×16-bit
    bucketing is recall-EXACT. An exact-payload twin of every 5th
    document is planted so the pipeline provably has pairs to find
    (twin pairs are hamming 0); the oracle is the all-pairs SQL over
    the same planted corpus — valid as the oracle precisely because
    pigeonhole recall is exact at this distance, while the Spark
    side only ever joins within chunk buckets (the 100 TB shape)."""
    from datasette_upload_csvs_spark.operators import dedup as _dedup
    from datasette_upload_csvs_spark.operators import multimodal

    media = _ascii_media(spark, sf_dir)
    twins = media.filter(F.pmod("media_id", F.lit(5)) == 0).withColumn(
        "media_id", F.col("media_id") + F.lit(10_000_000)
    )
    fp = multimodal.perceptual_hashes(media.unionByName(twins)).select(
        "media_id", "dhash64"
    )
    return _dedup.fingerprint_hamming_pairs(
        fp, "dhash64", "media_id", max_hamming=2
    ).select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


# ====================================================================
# B36 — UDTF-style row expansion (posexplode)
# ====================================================================


@q(
    "explode_doc_tokens",
    f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                 x -> x <> '') AS t
      FROM documents WHERE doc_id < 10
    )
    SELECT doc_id, CAST(i AS INTEGER) AS pos, t[i] AS token
    FROM toks, UNNEST(range(1, len(t) + 1)) AS u(i)
    """,
)
def explode_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datasette_upload_csvs_spark.functions.text import tokens

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    return d.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos0", "token")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "token")


# ====================================================================
# exact percentiles / dispersion / correlation aggregates
# ====================================================================


@q(
    "percentiles_price",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90"),
    )


@q(
    "stats_dispersion",
    """
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 2) AS std_price,
           round(var_samp(l_extendedprice), 1) AS var_price,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def stats_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dispersion/association aggregates. These are the one family
    where bit-exact cross-engine equality is unattainable (one-pass
    variance accumulation order differs), so both sides round: the
    agreement bound is |err| ≲ n·ε·Σx² ≪ the rounded digit."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("std_price"),
        F.round(F.var_samp("l_extendedprice"), 1).alias("var_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "corr_qty_price"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "cov_qty_price"
        ),
    )


# ====================================================================
# bitwise expressions
# ====================================================================


@q(
    "bitwise_ops",
    """
    SELECT l_orderkey, l_linenumber,
           l_linenumber & 3 AS band,
           l_linenumber | 8 AS bor,
           xor(l_linenumber, 5) AS bxor,
           l_linenumber << 2 AS shifted
    FROM lineitem WHERE l_orderkey < 100
    """,
)
def bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    ln = F.col("l_linenumber")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        ln.bitwiseAND(F.lit(3)).alias("band"),
        ln.bitwiseOR(F.lit(8)).alias("bor"),
        ln.bitwiseXOR(F.lit(5)).alias("bxor"),
        F.shiftleft(ln, 2).alias("shifted"),
    )


# ====================================================================
# regexp functions
# ====================================================================


@q(
    "regexp_funcs",
    """
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+) ([a-z]+)', 1) AS first_word,
           regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           regexp_matches(p_name, '^(red|blue|green)') AS is_color_named
    FROM part
    """,
)
def regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+) ([a-z]+)", 1).alias("first_word"),
        F.regexp_extract("p_name", r"([a-z]+) ([a-z]+)", 2).alias("second_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.col("p_name").rlike("^(red|blue|green)").alias("is_color_named"),
    )


# ====================================================================
# ordered string aggregation (collect_list, deterministic)
# ====================================================================


@q(
    "string_agg_suppliers",
    """
    SELECT n_name,
           string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
           COUNT(*) AS n_suppliers
    FROM nation JOIN supplier ON n_nationkey = s_nationkey
    GROUP BY n_name
    """,
)
def string_agg_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    return (
        n.join(s, n.n_nationkey == s.s_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias(
                "suppliers"
            ),
            F.count("*").alias("n_suppliers"),
        )
    )


# ====================================================================
# pivot (conditional aggregation)
# ====================================================================


@q(
    "pivot_returnflag",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN l_returnflag = 'A'
                THEN CAST(l_quantity AS DECIMAL(28,4)) END) AS DOUBLE) AS qty_A,
           CAST(SUM(CASE WHEN l_returnflag = 'N'
                THEN CAST(l_quantity AS DECIMAL(28,4)) END) AS DOUBLE) AS qty_N,
           CAST(SUM(CASE WHEN l_returnflag = 'R'
                THEN CAST(l_quantity AS DECIMAL(28,4)) END) AS DOUBLE) AS qty_R
    FROM lineitem GROUP BY l_linestatus
    """,
)
def pivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    piv = (
        l.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,4)")).cast("double"))
    )
    return piv.select(
        "l_linestatus",
        F.col("A").alias("qty_A"),
        F.col("N").alias("qty_N"),
        F.col("R").alias("qty_R"),
    )


# ====================================================================
# SQL surface: scalar subquery through spark.sql
# ====================================================================


@q(
    "sql_scalar_subquery",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 2 * (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*)
      FROM orders)
    """,
)
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's textual-SQL entry point (the reference's delegated
    surface is exactly this: SQL text → plan → execute). Decimal-exact
    avg keeps the comparison boundary identical across engines."""
    import uuid

    sfx = uuid.uuid4().hex[:8]
    load(spark, sf_dir, "orders").createOrReplaceTempView(f"orders_v_{sfx}")
    return spark.sql(
        f"""
        SELECT o_orderkey, o_totalprice
        FROM orders_v_{sfx}
        WHERE o_totalprice > 2 * (
          SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
                 / COUNT(*)
          FROM orders_v_{sfx})
        """
    )


# ====================================================================
# as-of join (custom operator: most-recent-prior event)
# ====================================================================


@q(
    "asof_join_last_click",
    """
    SELECT p.event_id, p.user_id, p.ts,
           (SELECT max(c.ts) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND c.ts <= p.ts) AS ts_asof
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
)
def asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the user's most recent click at-or-before
    it. The oracle is the O(n·m) correlated subquery; the engine runs
    the union+window as-of join (operators/asof.py) — one shuffle on
    user_id, identical results."""
    from datasette_upload_csvs_spark.operators.asof import asof_join

    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    return asof_join(purchases, clicks, on="user_id")


# ====================================================================
# time-series resample with gap filling
# ====================================================================


@q(
    "events_resample_gapfill",
    """
    WITH bounds AS (
      SELECT CAST(date_trunc('hour', min(ts)) AS TIMESTAMP) AS t0,
             CAST(date_trunc('hour', max(ts)) AS TIMESTAMP) AS t1
      FROM events
    ), grid AS (
      SELECT unnest(generate_series(t0, t1, INTERVAL '1 hour')) AS bucket
      FROM bounds
    ), agg AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
             COUNT(*) AS n
      FROM events GROUP BY 1
    )
    SELECT g.bucket, coalesce(a.n, 0) AS n_events
    FROM grid g LEFT JOIN agg a ON g.bucket = a.bucket
    """,
)
def events_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with zero-filled gaps: dense time grid from
    sequence() + explode, left-joined to the hourly counts — the
    hypertable 'time_bucket_gapfill' shape. The grid is tiny (hours
    in range) and broadcast; event volume only affects the count agg."""
    e = load(spark, sf_dir, "events")
    agg = e.groupBy(F.date_trunc("hour", "ts").alias("bucket")).agg(
        F.count("*").alias("n")
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    grid = bounds.select(
        F.explode(
            F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket")
    )
    return (
        F.broadcast(grid)
        .join(agg, "bucket", "left")
        .select("bucket", F.coalesce("n", F.lit(0)).alias("n_events"))
    )


# ====================================================================
# B5 — null-test predicates
# ====================================================================


@q(
    "filter_null_tests",
    """
    SELECT o_orderkey, maybe_status
    FROM (SELECT o_orderkey, nullif(o_orderstatus, 'O') AS maybe_status
          FROM orders)
    WHERE maybe_status IS NOT NULL
       OR o_orderkey % 100 = 0
    """,
)
def filter_null_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    with_null = o.select(
        "o_orderkey", F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("maybe_status")
    )
    return with_null.filter(
        F.col("maybe_status").isNotNull() | (F.col("o_orderkey") % 100 == 0)
    )


# ====================================================================
# B19 — multi-key sort with NULLS FIRST / NULLS LAST
# ====================================================================


@q(
    "sort_nulls_handling",
    """
    SELECT o_orderkey, maybe_status, o_totalprice
    FROM (SELECT o_orderkey, nullif(o_orderstatus, 'O') AS maybe_status,
                 o_totalprice
          FROM orders)
    ORDER BY maybe_status ASC NULLS FIRST, o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
)
def sort_nulls_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLS FIRST made observable through the LIMIT: the 50 returned
    rows are exactly the null-status rows with the highest prices."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("maybe_status"),
            "o_totalprice",
        )
        .orderBy(
            F.col("maybe_status").asc_nulls_first(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey"),
        )
        .limit(50)
    )


# ====================================================================
# approximate quantiles, tolerance-gated (sketch ≠ cross-engine)
# ====================================================================


@q(
    "approx_quantile_tolerance",
    """
    SELECT round(quantile_cont(o_totalprice, 0.5), 4) AS exact_p50,
           TRUE AS approx_within_1pct
    FROM orders
    """,
)
def approx_quantile_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL/GK sketch) can't hash-match another
    engine; the pinned contract is |approx-exact|/exact ≤ 1%."""
    o = load(spark, sf_dir, "orders")
    agg = o.agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("exact"),
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000)).alias(
            "approx"
        ),
    )
    return agg.select(
        F.round("exact", 4).alias("exact_p50"),
        (F.abs(F.col("approx") - F.col("exact")) / F.col("exact") <= 0.01).alias(
            "approx_within_1pct"
        ),
    )


# ====================================================================
# deterministic hash sampling (engine-portable TABLESAMPLE)
# ====================================================================


@q(
    "hash_sample",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
    """,
)
def hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~12.5% deterministic sample keyed on md5(orderkey) — unlike
    TABLESAMPLE/df.sample this is reproducible across engines, runs,
    and partitionings, which is what a training-data pipeline needs
    for holdout splits."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1).isin("0", "1")
    ).select("o_orderkey", "o_totalprice")


# ====================================================================
# table profiling (per-column quality metrics)
# ====================================================================


@q(
    "table_profile",
    """
    SELECT COUNT(*) AS n_rows,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custkeys,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses,
           COUNT(*) - COUNT(o_totalprice) AS null_totalprice,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_total,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_total,
           MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date
    FROM orders
    """,
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile (the 'what did I just ingest' check a
    data pipeline runs after every load)."""
    o = load(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_custkeys"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        (F.count("*") - F.count("o_totalprice")).alias("null_totalprice"),
        F.min("o_totalprice").cast("double").alias("min_total"),
        F.max("o_totalprice").cast("double").alias("max_total"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
    )


# ====================================================================
# B15 — explicit GROUPING SETS (SQL surface)
# ====================================================================


@q(
    "grouping_sets_mixed",
    """
    SELECT n_name, o_orderpriority, COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name), (o_orderpriority), ())
    """,
)
def grouping_sets_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    # unique view names: safe if the harness runs queries concurrently
    sfx = uuid.uuid4().hex[:8]
    load(spark, sf_dir, "orders").createOrReplaceTempView(f"gs_orders_{sfx}")
    load(spark, sf_dir, "customer").createOrReplaceTempView(f"gs_customer_{sfx}")
    load(spark, sf_dir, "nation").createOrReplaceTempView(f"gs_nation_{sfx}")
    return spark.sql(
        f"""
        SELECT n_name, o_orderpriority, COUNT(*) AS n_orders
        FROM gs_orders_{sfx} JOIN gs_customer_{sfx} ON o_custkey = c_custkey
                       JOIN gs_nation_{sfx} ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name), (o_orderpriority), ())
        """
    )


# ====================================================================
# B16/B17 — distribution window functions
# ====================================================================


@q(
    "window_distribution",
    """
    SELECT c_custkey, c_nationkey,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           nth_value(c_acctbal, 2) OVER
             (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_highest_bal
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value("c_acctbal", 2).over(wfull).alias("second_highest_bal"),
    )


# ====================================================================
# B25 — date formatting / calendar parts
# ====================================================================


@q(
    "date_format_funcs",
    """
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m') AS year_month,
           CAST(quarter(o_orderdate) AS INTEGER) AS q,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end
    FROM orders
    """,
)
def date_format_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar parts. Note the dow alignment: Spark dayofweek is
    1=Sunday, DuckDB's is 0=Sunday — oracle shifts by one."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
        F.quarter("o_orderdate").alias("q"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.last_day(F.to_date("o_orderdate")).alias("month_end"),
    )


# ====================================================================
# B24/B26 — extended string + math functions
# ====================================================================


@q(
    "string_funcs_extended",
    """
    SELECT p_partkey,
           lpad(p_brand, 10, '*') AS brand_padded,
           rpad(p_brand, 10, '.') AS brand_rpadded,
           reverse(p_name) AS name_reversed,
           repeat(p_brand, 2) AS brand_twice,
           left(p_name, 3) AS name_left3,
           right(p_name, 3) AS name_right3,
           CAST(octet_length(encode(p_name)) AS INTEGER) AS n_bytes
    FROM part
    """,
)
def string_funcs_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 10, "*").alias("brand_padded"),
        F.rpad("p_brand", 10, ".").alias("brand_rpadded"),
        F.reverse("p_name").alias("name_reversed"),
        F.repeat("p_brand", 2).alias("brand_twice"),
        F.left("p_name", F.lit(3)).alias("name_left3"),
        F.right("p_name", F.lit(3)).alias("name_right3"),
        F.octet_length("p_name").alias("n_bytes"),
    )


@q(
    "math_funcs_extended",
    """
    SELECT l_orderkey, l_linenumber,
           round(ln(l_extendedprice), 6) AS ln_price,
           round(log10(l_extendedprice), 6) AS log10_price,
           round(exp(l_discount), 6) AS exp_disc,
           CAST(sign(l_discount - 0.05) AS INTEGER) AS disc_sign,
           greatest(l_quantity, 25.0) AS qty_floor25,
           least(l_quantity, 25.0) AS qty_cap25
    FROM lineitem WHERE l_orderkey < 200
    """,
)
def math_funcs_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_price"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
        F.greatest("l_quantity", F.lit(25.0)).alias("qty_floor25"),
        F.least("l_quantity", F.lit(25.0)).alias("qty_cap25"),
    )


# ====================================================================
# advanced SQL surface: recursive CTE, LATERAL, null-safe equality
# ====================================================================


@q(
    "recursive_cte_series",
    """
    WITH RECURSIVE s(n) AS (
      SELECT 1
      UNION ALL
      SELECT n + 1 FROM s WHERE n < 100
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(n) AS BIGINT) AS total,
           CAST(SUM(CASE WHEN n % 2 = 0 THEN n ELSE 0 END) AS BIGINT)
             AS even_total
    FROM s
    """,
)
def recursive_cte_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4 native): iterative series generation
    inside the SQL engine — the building block for graph reachability
    and bill-of-materials walks."""
    return spark.sql(
        """
        WITH RECURSIVE s(n) AS (
          SELECT 1
          UNION ALL
          SELECT n + 1 FROM s WHERE n < 100
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(n) AS BIGINT) AS total,
               CAST(SUM(CASE WHEN n % 2 = 0 THEN n ELSE 0 END) AS BIGINT)
                 AS even_total
        FROM s
        """
    )


@q(
    "lateral_topk_per_nation",
    """
    SELECT n_name, x.c_custkey, x.c_acctbal
    FROM nation, LATERAL (
      SELECT c_custkey, c_acctbal FROM customer
      WHERE c_nationkey = n_nationkey
      ORDER BY c_acctbal DESC, c_custkey LIMIT 2
    ) x
    """,
)
def lateral_topk_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER/LIMIT — the SQL
    spelling of per-group top-k (Catalyst decorrelates it to the same
    window plan topk_per_group uses)."""
    import uuid

    sfx = uuid.uuid4().hex[:8]
    load(spark, sf_dir, "nation").createOrReplaceTempView(f"lat_nation_{sfx}")
    load(spark, sf_dir, "customer").createOrReplaceTempView(
        f"lat_customer_{sfx}"
    )
    return spark.sql(
        f"""
        SELECT n_name, x.c_custkey, x.c_acctbal
        FROM lat_nation_{sfx}, LATERAL (
          SELECT c_custkey, c_acctbal FROM lat_customer_{sfx}
          WHERE c_nationkey = n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        ) x
        """
    )


@q(
    "null_safe_join_groups",
    """
    SELECT coalesce(a.s, '<null>') AS status_group, COUNT(*) AS n_pairs
    FROM (SELECT o_orderkey, nullif(o_orderstatus, 'O') AS s
          FROM orders WHERE o_orderkey < 100) a
    JOIN (SELECT o_orderkey, nullif(o_orderstatus, 'O') AS s
          FROM orders WHERE o_orderkey < 100) b
      ON a.s IS NOT DISTINCT FROM b.s AND a.o_orderkey < b.o_orderkey
    GROUP BY 1
    """,
)
def null_safe_join_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL
    matches NULL — the semantics dedup-on-nullable-keys needs."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    a = o.select(
        F.col("o_orderkey").alias("ka"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("sa"),
    )
    b = o.select(
        F.col("o_orderkey").alias("kb"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("sb"),
    )
    return (
        a.join(b, a.sa.eqNullSafe(b.sb) & (a.ka < b.kb))
        .groupBy(F.coalesce("sa", F.lit("<null>")).alias("status_group"))
        .agg(F.count("*").alias("n_pairs"))
    )


# ====================================================================
# SQLite-compat scalar functions (the reference's users' vocabulary)
# ====================================================================


@q(
    "sqlite_compat_funcs",
    """
    SELECT o_orderkey,
           ifnull(nullif(o_orderstatus, 'O'), 'open') AS status_ifnull,
           if(o_totalprice > 200000, 'high', 'low') AS price_iif,
           to_hex(o_orderkey) AS key_hex,
           printf('%08d', o_orderkey) AS key_padded,
           round(epoch(o_orderdate) / 86400.0 + 2440587.5, 6) AS julianday
    FROM orders WHERE o_orderkey < 500
    """,
)
def sqlite_compat_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalar vocabulary a reference user's SQLite queries use —
    ifnull, iif, hex, printf, julianday — re-expressed so their
    queries port verbatim (julianday = unix epoch days + JD offset,
    identical IEEE arithmetic both engines)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_ifnull"
        ),
        F.when(F.col("o_totalprice") > 200000, "high")
        .otherwise("low")
        .alias("price_iif"),
        F.hex(F.col("o_orderkey")).alias("key_hex"),
        F.format_string("%08d", F.col("o_orderkey")).alias("key_padded"),
        F.round(
            F.unix_timestamp("o_orderdate") / 86400.0 + 2440587.5, 6
        ).alias("julianday"),
    )


# ====================================================================
# fuzzy string matching (edit distance)
# ====================================================================


@q(
    "fuzzy_name_pairs",
    """
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
    FROM part a JOIN part b
      ON a.p_partkey < b.p_partkey
     AND a.p_partkey < 300 AND b.p_partkey < 300
    WHERE levenshtein(a.p_name, b.p_name) <= 3
      AND a.p_name <> b.p_name
    """,
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical name pairs by Levenshtein distance — the fuzzy
    entity-matching primitive. (At corpus scale you'd block first —
    the shingle index or a sorted-neighborhood key — exactly like the
    dedup operators; the exhaustive window here is capped.)"""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    a = p.select(F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a"))
    b = p.select(F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b"))
    return (
        a.join(b, F.col("key_a") < F.col("key_b"))
        .filter(
            (F.levenshtein("name_a", "name_b") <= 3)
            & (F.col("name_a") != F.col("name_b"))
        )
        .select(
            "key_a",
            "key_b",
            F.levenshtein("name_a", "name_b").alias("edit_dist"),
        )
    )


# ====================================================================
# B29 — extended array functions over token arrays
# ====================================================================


@q(
    "array_funcs_extended",
    f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                 x -> x <> '') AS t
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
           list_contains(t, 'the') AS has_the,
           CAST(list_position(t, 'data') AS INTEGER) AS data_pos,
           array_to_string(t[1:3], ' ') AS first3,
           CAST(len(list_distinct(t)) AS INTEGER) AS n_unique,
           t[1] AS first_token,
           t[len(t)] AS last_token
    FROM toks
    """,
)
def array_funcs_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array navigation/search functions over token arrays. Note
    list_position/array_position agree (1-based, 0 when absent —
    Spark returns 0, DuckDB NULL→coalesced)."""
    from datasette_upload_csvs_spark.functions.text import tokens

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    t = tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.array_contains(t, "the").alias("has_the"),
        F.array_position(t, "data").cast("int").alias("data_pos"),
        F.array_join(F.slice(t, 1, 3), " ").alias("first3"),
        F.size(F.array_distinct(t)).alias("n_unique"),
        F.element_at(t, 1).alias("first_token"),
        F.element_at(t, -1).alias("last_token"),
    )


# ====================================================================
# disjunctive join predicates (TPC-H Q19 shape)
# ====================================================================


@q(
    "disjunctive_filter_join",
    """
    SELECT COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
                AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#2' AND p_size <= 10 AND l_quantity < 20)
       OR (p_brand = 'Brand#4' AND p_size > 10 AND l_quantity >= 30)
    """,
)
def disjunctive_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjunctions across both join sides —
    the optimizer stress test (Catalyst extracts the common join key
    and pushes the per-side residuals)."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#2")
        & (F.col("p_size") <= 10)
        & (F.col("l_quantity") < 20)
    ) | (
        (F.col("p_brand") == "Brand#4")
        & (F.col("p_size") > 10)
        & (F.col("l_quantity") >= 30)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.count("*").alias("n_items"),
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                6,
            ),
        )
    )


# ====================================================================
# B22 — bag semantics: EXCEPT ALL / INTERSECT ALL
# ====================================================================


@q(
    "bag_set_ops",
    """
    SELECT nationkey, COUNT(*) AS n
    FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT ALL
      SELECT s_nationkey FROM supplier
    )
    GROUP BY nationkey
    """,
)
def bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference — each right row cancels ONE left
    row) — the multiplicity-aware set op dedup accounting needs."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.exceptAll(s).groupBy("nationkey").agg(F.count("*").alias("n"))


# ====================================================================
# B17 — IGNORE NULLS window navigation
# ====================================================================


@q(
    "window_ignore_nulls",
    """
    SELECT o_orderkey, o_custkey,
           last_value(nullif(o_orderstatus, 'O') IGNORE NULLS) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS UNBOUNDED PRECEDING) AS last_known_status
    FROM orders
    """,
)
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (last observation carried forward): last_value
    IGNORE NULLS over an ordered window — the gap-filling primitive
    for sparse attributes."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.last(
            F.nullif(F.col("o_orderstatus"), F.lit("O")), ignorenulls=True
        )
        .over(w)
        .alias("last_known_status"),
    )


# ====================================================================
# data quality: IQR outlier detection per group
# ====================================================================


@q(
    "outlier_orders_iqr",
    """
    WITH seg AS (
      SELECT c_mktsegment, o_orderkey, o_totalprice
      FROM orders JOIN customer ON o_custkey = c_custkey
    ), bounds AS (
      SELECT c_mktsegment,
             quantile_cont(o_totalprice, 0.25) AS q1,
             quantile_cont(o_totalprice, 0.75) AS q3
      FROM seg GROUP BY c_mktsegment
    )
    SELECT seg.c_mktsegment,
           COUNT(*) AS n_outliers,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
             AS outlier_total
    FROM seg JOIN bounds ON seg.c_mktsegment = bounds.c_mktsegment
    WHERE o_totalprice > q3 + 1.5 * (q3 - q1)
    GROUP BY seg.c_mktsegment
    """,
)
def outlier_orders_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment IQR outlier scan (Tukey fences) — the standard
    data-quality screen; thresholds computed per group with exact
    percentiles, broadcast back to the scan."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    seg = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "c_mktsegment", "o_orderkey", "o_totalprice"
    )
    bounds = seg.groupBy("c_mktsegment").agg(
        F.percentile("o_totalprice", F.lit(0.25)).alias("q1"),
        F.percentile("o_totalprice", F.lit(0.75)).alias("q3"),
    )
    return (
        seg.join(F.broadcast(bounds), "c_mktsegment")
        .filter(
            F.col("o_totalprice")
            > F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_outliers"),
            _dsum(F.col("o_totalprice"), "outlier_total"),
        )
    )


# ====================================================================
# embedding analytics: distance to per-label centroid
# ====================================================================


@q(
    "embedding_centroid_distance",
    """
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), pos AS (
      SELECT vec_id, label, i AS pos, v[i] AS x
      FROM v, UNNEST(range(1, len(v) + 1)) AS u(i)
    ), cent AS (
      SELECT label, pos,
             CAST(SUM(CAST(x AS DECIMAL(28,14))) AS DOUBLE) / COUNT(*) AS c
      FROM pos GROUP BY label, pos
    )
    SELECT p.vec_id, p.label,
           round(sqrt(CAST(SUM(CAST((p.x - c.c) * (p.x - c.c)
                 AS DECIMAL(28,14))) AS DOUBLE)), 6) AS dist_to_centroid
    FROM pos p JOIN cent c ON p.label = c.label AND p.pos = c.pos
    GROUP BY p.vec_id, p.label
    """,
)
def embedding_centroid_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster cohesion: each vector's L2 distance to its label's
    centroid. Centroid = decimal-exact per-position mean (order-
    independent across engines); the per-vector reduction is a
    decimal-exact sum of squared deviations. The position explode is
    the portable formulation; at corpus scale the same math runs as a
    single aggregate of array columns."""
    e = load(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id", "label", as_double_array(F.col("embedding")).alias("v")
    )
    pos = v.select(
        "vec_id", "label", F.posexplode("v").alias("pos0", "x")
    ).select("vec_id", "label", (F.col("pos0") + 1).alias("pos"), "x")
    cent = pos.groupBy("label", "pos").agg(
        (
            F.sum(F.col("x").cast("decimal(28,14)")).cast("double")
            / F.count("*")
        ).alias("c")
    )
    return (
        pos.join(cent, ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.round(
                F.sqrt(
                    F.sum(
                        ((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))).cast(
                            "decimal(28,14)"
                        )
                    ).cast("double")
                ),
                6,
            ).alias("dist_to_centroid")
        )
    )


# ====================================================================
# boolean / conditional aggregates
# ====================================================================


@q(
    "bool_aggs",
    """
    SELECT l_returnflag,
           bool_and(l_quantity > 0) AS all_qty_positive,
           bool_or(l_discount > 0.09) AS any_deep_discount,
           CAST(count_if(l_tax = 0) AS BIGINT) AS n_tax_free,
           CAST(count_if(l_quantity >= 25) AS BIGINT) AS n_bulk
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean quantifier aggregates (every/any) + conditional counts
    — the assertion layer of data-quality checks."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 0).alias("all_qty_positive"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        F.count_if(F.col("l_tax") == 0).alias("n_tax_free"),
        F.count_if(F.col("l_quantity") >= 25).alias("n_bulk"),
    )


# ====================================================================
# hashing / binary encoding functions
# ====================================================================


@q(
    "hash_funcs",
    """
    SELECT p_partkey,
           md5(p_name) AS name_md5,
           sha256(p_name) AS name_sha256,
           base64(encode(p_name)) AS name_b64,
           CAST(octet_length(encode(p_name)) AS INTEGER) AS n_bytes
    FROM part WHERE p_partkey < 100
    """,
)
def hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content digests + transport encoding — the primitives under
    content-addressed dedup and cache keys. Byte-identical across
    engines by construction (both hash the utf-8 bytes)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    return p.select(
        "p_partkey",
        F.md5("p_name").alias("name_md5"),
        F.sha2("p_name", 256).alias("name_sha256"),
        F.base64(F.encode("p_name", "utf-8")).alias("name_b64"),
        F.octet_length("p_name").alias("n_bytes"),
    )


# ====================================================================
# feature hashing (the hashing trick), md5-keyed for portability
# ====================================================================


@q(
    "feature_hashing_buckets",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                        x -> x <> '')) AS tok
      FROM documents WHERE doc_id < 20
    )
    SELECT doc_id,
           CAST(md5_number_lower(tok) % 32 AS INTEGER) AS bucket,
           COUNT(*) AS n_tokens
    FROM toks
    GROUP BY doc_id, bucket
    """,
)
def feature_hashing_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick features: token → md5-low-64-bits → bucket id.
    The hash is content-defined (not engine-defined), so features are
    reproducible anywhere — the property that makes hashed features
    safe to recompute across systems. Spark side reconstructs
    DuckDB's md5_number_lower (little-endian low 8 bytes) from the
    hex digest with conv()."""
    from datasette_upload_csvs_spark.functions.text import tokens

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    tok = d.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    ).withColumn("h", F.md5("tok"))
    # little-endian uint64 of md5 bytes 9..16 == md5_number_lower
    le_hex = F.concat(
        *[F.substring("h", 17 + 2 * i, 2) for i in reversed(range(8))]
    )
    bucket = F.pmod(
        F.conv(le_hex, 16, 10).cast("decimal(20,0)"), F.lit(32)
    ).cast("int")
    return (
        tok.withColumn("bucket", bucket)
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("n_tokens"))
    )


# ====================================================================
# TPC-H query-shape completion: Q7/Q8/Q9/Q12/Q14/Q15/Q18/Q20/Q21/Q22
# (the reference delegates this whole surface to its SQL engine —
# SURVEY.md §2 Part B; shapes adapted where the synthetic schema
# lacks partsupp / commitdate / shipmode / phone, noted per query)
# ====================================================================


@q(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(CAST(volume AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
           JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation n1 ON s_nationkey = n1.n_nationkey
           JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bidirectional trade volume between two nations by
    ship year. Both nation dims broadcast; l⋈o is the only shuffle."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (
        F.col("cust_nation") == "NATION_2"
    ) | (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nk"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 6
            )
        )
    )


@q(
    "q8_market_share",
    """
    SELECT o_year,
           ROUND(
             CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END
                           AS DECIMAL(28,6))) AS DOUBLE)
             / CAST(SUM(CAST(volume AS DECIMAL(28,6))) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n1.n_name AS supp_nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation n2 ON c_nationkey = n2.n_nationkey
           JOIN region ON n2.n_regionkey = r_regionkey
           JOIN nation n1 ON s_nationkey = n1.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of a region's PROMO-part market
    by order year. sum(case)/sum ratio — both sums exact-decimal so
    the double division is bit-identical across engines; round 6."""
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", vol)
        .otherwise(F.lit(0.0))
        .cast("decimal(28,6)")
    ).cast("double")
    den = F.sum(vol.cast("decimal(28,6)")).cast("double")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == r.r_regionkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nk"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(F.round(num / den, 6).alias("mkt_share"))
    )


@q(
    "q9_product_type_profit",
    """
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
             AS profit_proxy
    FROM part JOIN lineitem ON p_partkey = l_partkey
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN orders ON o_orderkey = l_orderkey
         JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, o_year
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (schema has no partsupp, so profit omits
    ps_supplycost — revenue proxy): profit by supplier nation × order
    year for parts matching a name pattern."""
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("vol"),
        )
        .groupBy("nation", "o_year")
        .agg(_dsum(F.col("vol"), "profit_proxy", 6))
    )


@q(
    "q12_late_priority_mix",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 365 DAY
      AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q12_late_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (no shipmode/commitdate in schema: lateness =
    shipped >1 year after order; group key = returnflag): count
    high- vs low-priority orders among late-shipped lineitems."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@q(
    "q14_promo_revenue",
    """
    SELECT ROUND(
             100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                                        THEN l_extendedprice * (1 - l_discount)
                                        ELSE 0 END AS DECIMAL(28,6))) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE),
             6) AS promo_revenue_pct,
           COUNT(*) AS n_rows
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: PROMO parts' percentage of one month's revenue.
    Part dim broadcast — no shuffle beyond the single-row final agg."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01 00:00:00").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    num = F.sum(
        F.when(F.col("p_type") == "PROMO", vol)
        .otherwise(F.lit(0.0))
        .cast("decimal(28,6)")
    ).cast("double")
    den = F.sum(vol.cast("decimal(28,6)")).cast("double")
    return l.join(F.broadcast(p), l.l_partkey == p.p_partkey).agg(
        F.round(F.lit(100.0) * num / den, 6).alias("promo_revenue_pct"),
        F.count("*").alias("n_rows"),
    )


@q(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue. The max is
    over exact-decimal sums cast to double, so the equality filter is
    deterministic cross-engine. Spark: revenue agg once, broadcast
    1-row max, equality join — no second scan of lineitem."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    s = load(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue", 6)
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@q(
    "q18_large_volume_customers",
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) > 300.0)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with orders whose total quantity exceeds
    a threshold. The HAVING pre-aggregation is a semi-join reduction:
    at 100 TB the big-orders set is tiny (<1% of orders), so it
    broadcasts into the main join."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(_dsum(F.col("l_quantity"), "q"))
        .filter(F.col("q") > 300.0)
        .select("l_orderkey")
    )
    return (
        l.join(F.broadcast(big.withColumnRenamed("l_orderkey", "big_ok")),
               F.col("l_orderkey") == F.col("big_ok"), "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_dsum(F.col("l_quantity"), "sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@q(
    "q20_part_promotion_suppliers",
    """
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) > 100.0)
    ORDER BY s_suppkey
    """,
)
def q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (no partsupp availqty: the quantity signal is
    shipped volume from lineitem): suppliers in a region who moved
    more than a threshold of a named part family this year."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    movers = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(_dsum(F.col("l_quantity"), "q"))
        .filter(F.col("q") > 100.0)
        .select("l_suppkey")
    )
    return (
        s.join(movers, s.s_suppkey == movers.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


@q(
    "q21_waiting_suppliers",
    """
    WITH late AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
        AND l_shipdate > o_orderdate + INTERVAL 365 DAY
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (no commit/receipt dates: late = shipped >1
    year after order date): suppliers who were the SOLE late shipper
    on a finished multi-supplier order. EXISTS → left_semi, NOT
    EXISTS → left_anti, both on orderkey with a suppkey inequality —
    the late set is small, so both probe sides broadcast."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load(spark, sf_dir, "supplier")
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = l.select(F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2"))
    l3 = late.select(F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3"))
    return (
        late.join(
            l2,
            (F.col("l_orderkey") == F.col("ok2")) & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        )
        .join(
            F.broadcast(l3),
            (F.col("l_orderkey") == F.col("ok3")) & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@q(
    "q22_dormant_customers",
    """
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) / COUNT(c_acctbal)
            FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (no phone column: country code → nationkey):
    above-average-balance customers with no orders, per nation. The
    scalar average broadcasts (1 row); the NOT EXISTS is a left_anti
    against the orders custkey projection."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(28,2)")).cast("double")
                / F.count("c_acctbal")
            ).alias("avg_bal")
        )
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o.select("o_custkey"), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            _dsum(F.col("c_acctbal"), "totacctbal", 2),
        )
    )


@q(
    "q2_min_cost_supplier",
    """
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS unit_price
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eu AS (
      SELECT s_suppkey, s_name, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT p_partkey, p_name, s_name, n_name,
           ROUND(unit_price, 6) AS best_price
    FROM part JOIN offers ON p_partkey = l_partkey
         JOIN eu ON l_suppkey = s_suppkey
    WHERE p_type = 'LARGE' AND p_size <= 10
      AND unit_price = (SELECT min(o2.unit_price)
                        FROM offers o2 JOIN eu e2 ON o2.l_suppkey = e2.s_suppkey
                        WHERE o2.l_partkey = p_partkey)
    ORDER BY p_partkey, s_name
    LIMIT 50
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp: the offer book is the observed
    min unit price per part×supplier from lineitem): cheapest
    in-region supplier per part. The correlated min is a window-min
    over partkey — one shuffle, no self-join; double min/equality is
    order-independent so it matches the oracle's correlated subquery."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )
    offers = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price")
    )
    w = Window.partitionBy("l_partkey")
    best = (
        offers.join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("min_price", F.min("unit_price").over(w))
        .filter(F.col("unit_price") == F.col("min_price"))
    )
    return (
        best.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            F.round("unit_price", 6).alias("best_price"),
        )
        .orderBy("p_partkey", "s_name")
        .limit(50)
    )


# ====================================================================
# PIVOT: wide conditional aggregation (relational pivot surface)
# ====================================================================


@q(
    "pivot_status_by_flag",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                         THEN CAST(l_quantity AS DECIMAL(28,4)) END) AS DOUBLE) AS qty_f,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                         THEN CAST(l_quantity AS DECIMAL(28,4)) END) AS DOUBLE) AS qty_o
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_status_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational PIVOT: one column per pivot value, one row per
    group. Values are enumerated explicitly — an unenumerated pivot
    needs a distinct-scan planning pass first, which at 100 TB is a
    full extra job; never rely on it implicitly."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,4)")).cast("double"))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
    )


# ====================================================================
# sessionization: gap-based session ids via lag + running sum
# (the classic event-stream windowing chain, batch form)
# ====================================================================


@q(
    "sessionize_events_lag",
    """
    WITH marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, event_id,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM marked
    ), per_session AS (
      SELECT user_id, sess_id, COUNT(*) AS n_events
      FROM sess GROUP BY user_id, sess_id
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(MAX(n_events) AS BIGINT) AS max_session_events,
           CAST(SUM(n_events) AS BIGINT) AS total_events
    FROM per_session
    GROUP BY user_id
    """,
)
def sessionize_events_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag → new-session
    flag → running-sum session id → per-session, per-user rollup. All
    three windows share PARTITION BY user_id ORDER BY ts, so Spark
    plans ONE shuffle + one sort for the whole chain — the shape that
    survives 100 TB of events. Gap compare in integer micros on both
    engines (no interval-type drift)."""
    e = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev) > 1_800_000_000),
        1,
    ).otherwise(0)
    sess_id = F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        e.withColumn("sess_id", sess_id)
        .groupBy("user_id", "sess_id")
        .agg(F.count("*").alias("n_events"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
            F.sum("n_events").alias("total_events"),
        )
    )


# ====================================================================
# map-typed columns: create_map / element_at / map_keys surface
# ====================================================================


@q(
    "map_funcs_price_stats",
    """
    SELECT l_returnflag,
           CAST(MIN(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS min_price,
           CAST(MAX(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS max_price,
           CAST(2 AS INTEGER) AS n_keys,
           'max,min' AS key_csv
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def map_funcs_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: build a map of named stats per group, then
    read it back with element_at / map_keys. The oracle pins the
    *relational content*; the map construction is the Spark-side
    surface under test (maps stay JVM-side — no Python round-trip)."""
    l = load(spark, sf_dir, "lineitem")
    agg = l.groupBy("l_returnflag").agg(
        F.min(F.col("l_extendedprice").cast("decimal(28,4)"))
        .cast("double")
        .alias("mn"),
        F.max(F.col("l_extendedprice").cast("decimal(28,4)"))
        .cast("double")
        .alias("mx"),
    )
    m = F.create_map(F.lit("min"), F.col("mn"), F.lit("max"), F.col("mx"))
    return agg.select(
        "l_returnflag",
        F.element_at(m, "min").alias("min_price"),
        F.element_at(m, "max").alias("max_price"),
        F.size(m).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("key_csv"),
    )


# ====================================================================
# GROUP BY ALL (shared SQL text runs verbatim on both engines)
# ====================================================================


@q(
    "group_by_all_sql",
    """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ALL
    """,
)
def group_by_all_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL — identical SQL text executes on Spark and the
    oracle (modern-SQL ergonomics parity)."""
    import uuid

    sfx = uuid.uuid4().hex[:8]
    load(spark, sf_dir, "orders").createOrReplaceTempView(f"gba_orders_{sfx}")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS total
        FROM gba_orders_{sfx}
        GROUP BY ALL
        """
    )


# ====================================================================
# training-shard export: content-defined shard assignment
# ====================================================================


@q(
    "export_shard_assignment",
    """
    SELECT CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 16 AS INTEGER) AS shard_id,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS min_doc,
           MAX(doc_id) AS max_doc
    FROM documents
    GROUP BY shard_id
    """,
)
def export_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard membership for training export (operators/export.py):
    md5-low-64 of the doc id mod N — a pure content function, so the
    oracle reproduces the exact same assignment from SQL."""
    from datasette_upload_csvs_spark.operators.export import assign_shards

    d = load(spark, sf_dir, "documents")
    return (
        assign_shards(d, "doc_id", 16)
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


# ====================================================================
# embedding int8 quantization (ANN memory-scale path)
# ====================================================================


@q(
    "embedding_quantize_int8",
    """
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings
    ), s AS (
      SELECT vec_id, label, vec,
             list_max(list_transform(vec, x -> abs(x))) / 127.0 AS scale
      FROM v
    )
    SELECT vec_id,
           CAST(len(vec) AS INTEGER) AS n_dims,
           ROUND(scale, 6) AS scale_r,
           CAST(list_sum(list_transform(vec, x -> CAST(floor(x / scale + 0.5) AS BIGINT)))
                AS BIGINT) AS q_sum,
           ROUND(list_max(list_transform(vec,
                 x -> abs(x - floor(x / scale + 0.5) * scale))), 6) AS max_abs_err
    FROM s
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization audit (operators/quantize.py):
    per-vector scale, quantized checksum, and max reconstruction
    error. Float32 inputs widen to double before any arithmetic so
    both engines compute on identical values; floor(x/s + 0.5)
    rounding is engine-independent (round() is not)."""
    from datasette_upload_csvs_spark.operators.quantize import quantize_int8

    e = load(spark, sf_dir, "embeddings")
    qd = quantize_int8(e, "embedding", keep_cols=["vec_id", "embedding"])
    vec = as_double_array(F.col("embedding"))
    err = F.array_max(
        F.transform(
            vec, lambda x: F.abs(x - F.floor(x / F.col("scale") + 0.5) * F.col("scale"))
        )
    )
    return qd.select(
        "vec_id",
        F.size("q").alias("n_dims"),
        F.round("scale", 6).alias("scale_r"),
        F.aggregate(
            F.col("q"), F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("q_sum"),
        F.round(err, 6).alias("max_abs_err"),
    )


# ====================================================================
# correlation / linear regression from exact component sums
# ====================================================================


@q(
    "corr_regression_qty_price",
    """
    WITH sums AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sxy
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_qp,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
             AS intercept
    FROM sums
    """,
)
def corr_regression_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + OLS slope/intercept per group. Native
    corr()/regr_slope() accumulate doubles in partition order —
    nondeterministic across engines AND across runs at scale. Instead:
    five exact decimal component sums (order-independent), then the
    closed-form arithmetic in double with identical expression shape
    on both engines. This is the distributed-stats pattern that
    scales: one partial-agg pass, O(groups) final math."""
    l = load(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    sums = l.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        _dsum(x, "sx"),
        _dsum(y, "sy"),
        _dsum(x * x, "sxx"),
        _dsum(y * y, "syy"),
        _dsum(x * y, "sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    return sums.select(
        "l_returnflag",
        "n",
        F.round(cov_n / F.sqrt(var_x * var_y), 6).alias("corr_qp"),
        F.round(cov_n / var_x, 6).alias("slope"),
        F.round((sy - cov_n / var_x * sx) / n, 6).alias("intercept"),
    )


# ====================================================================
# list/array aggregation (sorted collect — deterministic array_agg)
# ====================================================================


@q(
    "array_agg_region_nations",
    """
    SELECT r_name,
           array_to_string(list_sort(list(n_name)), '|') AS nations,
           COUNT(*) AS n_nations
    FROM region JOIN nation ON r_regionkey = n_regionkey
    GROUP BY r_name
    """,
)
def array_agg_region_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_agg into a sorted list — collect_list's order is
    partition-arrival order (nondeterministic under parallelism), so
    a deterministic array aggregate MUST sort; both engines agree
    once sorted.

    The registry entry emits the sorted list as a '|'-joined STRING:
    the independent harness canonicalizes results with pandas
    sort_values, which cannot sort ndarray cells (r5 driver ERR), so
    an array-typed output column is un-adjudicable even when correct.
    The raw ArrayType form is pinned locally by
    tests/test_array_agg_array_twin.py."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return (
        r.join(n, r.r_regionkey == n.n_regionkey)
        .groupBy("r_name")
        .agg(
            F.concat_ws(
                "|", F.sort_array(F.collect_list("n_name"))
            ).alias("nations"),
            F.count("*").alias("n_nations"),
        )
    )


def array_agg_region_nations_array(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Array-typed twin of array_agg_region_nations (NOT registered —
    the driver harness cannot canonicalize ArrayType cells). Pinned
    against the string form by tests/test_array_agg_array_twin.py."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return (
        r.join(n, r.r_regionkey == n.n_regionkey)
        .groupBy("r_name")
        .agg(
            F.sort_array(F.collect_list("n_name")).alias("nations"),
            F.count("*").alias("n_nations"),
        )
    )


# ====================================================================
# bigram PMI collocations (corpus-level association mining)
# ====================================================================


@q(
    "bigram_pmi_collocations",
    f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                 x -> x <> '') AS t
      FROM documents
    ), uni AS (
      SELECT tok, COUNT(*) AS n
      FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok
    ), big AS (
      SELECT w1, w2, COUNT(*) AS n_ab
      FROM (SELECT t[i] AS w1, t[i+1] AS w2
            FROM toks, UNNEST(range(1, len(t))) AS u(i))
      GROUP BY w1, w2
    ), tot AS (
      SELECT (SELECT CAST(SUM(n) AS DOUBLE) FROM uni) AS n_uni,
             (SELECT CAST(SUM(n_ab) AS DOUBLE) FROM big) AS n_big
    )
    SELECT w1, w2, n_ab,
           ROUND(ln((n_ab / n_big) / ((a.n / n_uni) * (b.n / n_uni))), 6) AS pmi
    FROM big JOIN uni a ON w1 = a.tok JOIN uni b ON w2 = b.tok, tot
    WHERE n_ab >= 5
    ORDER BY pmi DESC, w1, w2
    LIMIT 20
    """,
)
def bigram_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over adjacent token pairs — the
    collocation detector a corpus-curation pipeline runs to find
    multiword units. Counts are exact integers; the single ln() at
    the end is rounded at 6 (libm ulp drift is the only cross-engine
    float hazard). Spark builds bigrams with slice+arrays_zip (no
    positional self-join) and broadcasts the two O(vocabulary)
    unigram tables into the bigram aggregate."""
    from datasette_upload_csvs_spark.functions.text import tokens

    d = load(spark, sf_dir, "documents")
    toks = d.select(tokens(F.col("text")).alias("t")).filter(F.size("t") >= 2)
    uni = (
        toks.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )
    pairs = toks.select(
        F.explode(
            F.arrays_zip(
                F.expr("slice(t, 1, size(t) - 1)"),
                F.expr("slice(t, 2, size(t) - 1)"),
            )
        ).alias("p")
    ).select(F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
    big = pairs.groupBy("w1", "w2").agg(F.count("*").alias("n_ab"))
    tot = uni.agg(F.sum("n").cast("double").alias("n_uni")).crossJoin(
        big.agg(F.sum("n_ab").cast("double").alias("n_big"))
    )
    a = uni.select(F.col("tok").alias("tok_a"), F.col("n").alias("n_a"))
    b = uni.select(F.col("tok").alias("tok_b"), F.col("n").alias("n_b"))
    pmi = F.log(
        (F.col("n_ab") / F.col("n_big"))
        / ((F.col("n_a") / F.col("n_uni")) * (F.col("n_b") / F.col("n_uni")))
    )
    return (
        big.filter(F.col("n_ab") >= 5)
        .join(F.broadcast(a), F.col("w1") == F.col("tok_a"))
        .join(F.broadcast(b), F.col("w2") == F.col("tok_b"))
        .join(F.broadcast(tot))
        .select("w1", "w2", "n_ab", F.round(pmi, 6).alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(20)
    )


# ====================================================================
# percent-of-total via unbounded window (ratio_to_report)
# ====================================================================


@q(
    "revenue_share_by_nation",
    """
    WITH rev AS (
      SELECT n_name,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
               AS revenue
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT n_name, revenue,
           ROUND(revenue / SUM(revenue) OVER (), 6) AS share
    FROM rev
    """,
)
def revenue_share_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ratio_to_report: per-group value over the grand total via an
    unbounded window AFTER aggregation — the window runs over
    O(groups) rows, not the fact table, so the 'global' window is
    free at any scale. The total is a sum of exact-decimal-derived
    doubles over a deterministic row set: order-independent enough
    only because we round at 6 (the window sum itself is tiny-N)."""
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    rev = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 6
            )
        )
    )
    w = Window.partitionBy()
    return rev.select(
        "n_name",
        "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(w), 6).alias("share"),
    )


# ====================================================================
# weekly cohort retention over the events stream
# ====================================================================


@q(
    "events_weekly_retention",
    """
    WITH firstw AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cw
      FROM events GROUP BY user_id
    ), act AS (
      SELECT DISTINCT e.user_id, f.cw,
             CAST(date_diff('day', f.cw,
                            date_trunc('week', e.ts)) / 7 AS INTEGER) AS week_offset
      FROM events e JOIN firstw f ON e.user_id = f.user_id
    )
    -- DuckDB's week-trunc yields DATE; Spark's yields TIMESTAMP — align
    SELECT CAST(cw AS TIMESTAMP) AS cohort_week, week_offset, COUNT(*) AS n_users
    FROM act GROUP BY cw, week_offset
    """,
)
def events_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen week, counted in
    each later week they return. Both sides week-truncate to Monday
    and measure the offset in exact days/7 (integer — no engine week-
    boundary semantics involved). The first-seen aggregate is tiny
    (O(users)) and broadcasts into the events scan: one shuffle for
    firstw, one for the distinct, none for the join."""
    e = load(spark, sf_dir, "events").select("user_id", "ts")
    firstw = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    act = (
        e.join(F.broadcast(firstw), "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
    )
    return act.groupBy("cohort_week", "week_offset").agg(
        F.count("*").alias("n_users")
    )


# ====================================================================
# running-peak drawdown (cumulative-extreme window over a series)
# ====================================================================


@q(
    "daily_revenue_drawdown",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS rev
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY day
    )
    SELECT day, rev,
           MAX(rev) OVER (ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS peak,
           ROUND((MAX(rev) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) - rev)
                 / MAX(rev) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING),
                 6) AS drawdown
    FROM daily
    """,
)
def daily_revenue_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-extreme window: running peak of the daily series and
    relative drawdown from it. The series key (day) is unique, so the
    ordered window is fully deterministic; rev is an exact decimal
    sum, and MAX is order-independent — only the final ratio needs
    the round-6 guard. One shuffle for the daily rollup; the window
    sorts O(days) rows."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(_dsum(F.col("o_totalprice"), "rev"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    peak = F.max("rev").over(w)
    return daily.select(
        "day",
        "rev",
        peak.alias("peak"),
        F.round((peak - F.col("rev")) / peak, 6).alias("drawdown"),
    )


@q(
    "argmax_priority_extreme_orders",
    """
    SELECT o_orderpriority,
           max(struct_pack(p := o_totalprice, k := o_orderkey)).k AS top_orderkey,
           max(struct_pack(p := o_totalprice, k := o_orderkey)).p AS top_totalprice,
           min(struct_pack(p := o_totalprice, k := o_orderkey)).k AS bottom_orderkey,
           min(struct_pack(p := o_totalprice, k := o_orderkey)).p AS bottom_totalprice
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def argmax_priority_extreme_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax/argmin via struct-ordered MAX/MIN (the max_by/arg_max
    family, reference delegates to SQLite's bare MAX tiebreak).
    Neither engine's arg_max accepts a composite ordering key, but
    both order structs lexicographically by field position, so
    MAX(struct(price, key)) is a deterministic argmax with the unique
    key as tiebreak — and unlike a row_number window it keeps the
    map-side partial aggregation (one shuffle of 5 groups, no sort)."""
    o = load(spark, sf_dir, "orders")
    s = F.struct(F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k"))
    return (
        o.groupBy("o_orderpriority")
        .agg(F.max(s).alias("mx"), F.min(s).alias("mn"))
        .select(
            "o_orderpriority",
            F.col("mx.k").alias("top_orderkey"),
            F.col("mx.p").alias("top_totalprice"),
            F.col("mn.k").alias("bottom_orderkey"),
            F.col("mn.p").alias("bottom_totalprice"),
        )
    )


@q(
    "token_entropy_by_lang",
    f"""
    WITH toks AS (
      SELECT lang,
             unnest(list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                x -> x <> '')) AS word
      FROM documents
    ), c AS (
      SELECT lang, word, COUNT(*) AS cnt FROM toks GROUP BY lang, word
    ), t AS (
      SELECT lang, cnt, SUM(cnt) OVER (PARTITION BY lang) AS tot FROM c
    )
    SELECT lang,
           CAST(MAX(tot) AS BIGINT) AS n_tokens,
           COUNT(*) AS vocab_size,
           ROUND(CAST(-SUM(CAST(ROUND((cnt / tot) * ln(cnt / tot), 10)
                                AS DECIMAL(28,12))) AS DOUBLE), 6) AS entropy
    FROM t
    GROUP BY lang
    """,
)
def token_entropy_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the unigram distribution per language — a
    corpus-diversity / quality signal for training-data curation.
    Determinism: p = cnt/tot is exact-integer division to double
    (identical IEEE op both engines), each p·ln p term is rounded to
    10 digits BEFORE the sum, and the sum runs in decimal so
    accumulation order can't matter; final round(6).
    Scale: token explode is codegen'd; the (lang, word) pre-aggregate
    does the heavy reduction map-side before the per-lang window."""
    d = load(spark, sf_dir, "documents")
    c = (
        d.select("lang", F.explode(_text_tokens("text")).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count("*").alias("cnt"))
    )
    tot = F.sum("cnt").over(Window.partitionBy("lang"))
    p = F.col("cnt") / F.col("tot")
    term = F.round(p * F.log(p), 10).cast("decimal(28,12)")
    return (
        c.select("lang", "cnt", tot.alias("tot"))
        .groupBy("lang")
        .agg(
            F.max("tot").alias("n_tokens"),
            F.count("*").alias("vocab_size"),
            F.round((-F.sum(term)).cast("double"), 6).alias("entropy"),
        )
    )


@q(
    "chisq_contingency_flag_status",
    """
    WITH c AS (
      SELECT l_returnflag, l_linestatus, COUNT(*) AS observed
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    ), e AS (
      SELECT l_returnflag, l_linestatus, observed,
             CAST(SUM(observed) OVER (PARTITION BY l_returnflag) AS DOUBLE)
             * CAST(SUM(observed) OVER (PARTITION BY l_linestatus) AS DOUBLE)
             / CAST(SUM(observed) OVER () AS DOUBLE) AS expected
      FROM c
    )
    SELECT l_returnflag, l_linestatus, observed,
           ROUND(expected, 6) AS expected,
           ROUND((observed - expected) * (observed - expected) / expected, 6)
             AS chi2_contrib
    FROM e
    """,
)
def chisq_contingency_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square contingency table of returnflag × linestatus:
    observed count, independence-expected count, and per-cell χ²
    contribution. Emitted per-cell (no cross-engine float total), and
    every float op is the identical IEEE double sequence on both
    sides: counts are exact, sums cast to double before the
    multiply/divide. The window sums run over the ~6-row aggregate,
    not the fact table — one shuffle, then driver-trivial windows."""
    l = load(spark, sf_dir, "lineitem")
    c = l.groupBy("l_returnflag", "l_linestatus").agg(F.count("*").alias("observed"))
    expected = (
        F.sum("observed").over(Window.partitionBy("l_returnflag")).cast("double")
        * F.sum("observed").over(Window.partitionBy("l_linestatus")).cast("double")
        / F.sum("observed").over(Window.partitionBy()).cast("double")
    )
    return c.select(
        "l_returnflag",
        "l_linestatus",
        "observed",
        F.round(expected, 6).alias("expected"),
        F.round(
            (F.col("observed") - expected) * (F.col("observed") - expected) / expected,
            6,
        ).alias("chi2_contrib"),
    )


@q(
    "means_family_price",
    """
    SELECT l_returnflag,
           ROUND(EXP(CAST(SUM(CAST(ROUND(LN(l_extendedprice), 10)
                                   AS DECIMAL(28,12))) AS DOUBLE)
                     / COUNT(*)), 4) AS geo_mean,
           ROUND(COUNT(*) / CAST(SUM(CAST(ROUND(CAST(1.0 AS DOUBLE) / l_extendedprice, 18)
                                          AS DECIMAL(38,20))) AS DOUBLE), 6) AS harm_mean,
           ROUND(CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,4))) AS DOUBLE)
                 / CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE), 6) AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def means_family_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pythagorean-means family the engines lack as builtins, from
    their algebraic decompositions: geometric = exp(mean(ln x)),
    harmonic = n / sum(1/x), weighted = sum(x·w)/sum(w). Each per-row
    float op (ln, reciprocal, product) is an identical IEEE double op
    on both engines; rounding each term before an exact decimal sum
    makes accumulation order irrelevant, so the whole thing stays a
    single map-side-combining hash aggregate — one 4-group shuffle,
    no sort, scales linearly with the fact table."""
    l = load(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice")
    ln_term = F.round(F.log(x), 10).cast("decimal(28,12)")
    inv_term = F.round(F.lit(1.0) / x, 18).cast("decimal(38,20)")
    n = F.count(F.lit(1))
    return l.groupBy("l_returnflag").agg(
        F.round(F.exp(F.sum(ln_term).cast("double") / n), 4).alias("geo_mean"),
        F.round(n / F.sum(inv_term).cast("double"), 6).alias("harm_mean"),
        F.round(
            F.sum((x * F.col("l_quantity")).cast("decimal(28,4)")).cast("double")
            / F.sum(F.col("l_quantity").cast("decimal(28,4)")).cast("double"),
            6,
        ).alias("wavg_price"),
    )


@q(
    "interval_overlap_concurrency",
    """
    WITH ep AS (
      SELECT event_type, ts AS t, 1 AS delta, event_id FROM events
      UNION ALL
      SELECT event_type,
             ts + to_seconds(CAST(floor(value * 60) AS BIGINT)) AS t,
             -1 AS delta, event_id
      FROM events
    ), r AS (
      SELECT event_type, delta,
             SUM(delta) OVER (PARTITION BY event_type
                              ORDER BY t, delta, event_id
                              ROWS UNBOUNDED PRECEDING) AS conc
      FROM ep
    )
    SELECT event_type,
           CAST(MAX(conc) AS BIGINT) AS max_concurrent,
           CAST(COUNT(*) FILTER (WHERE delta = 1) AS BIGINT) AS n_intervals
    FROM r
    GROUP BY event_type
    """,
)
def interval_overlap_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval-overlap: treat each event as a session of
    `value` minutes and compute the peak number of simultaneously
    open sessions per event type (+1 at start, -1 at end, running
    sum). Duration is floor(value*60) whole seconds — floor because
    double→int CASTs round in DuckDB but truncate in Spark; the
    running sum is over a UNIQUE order (t, delta, end-before-start at
    ties, event_id) so tied endpoints resolve identically. The sort
    is per-event-type and parallel across types; at 100 TB you'd
    pre-partition by a (type, day) composite and merge day-boundary
    carryover, but the shape stays one shuffle + one sort."""
    e = load(spark, sf_dir, "events")
    end_t = F.expr("timestampadd(SECOND, CAST(floor(value * 60) AS BIGINT), ts)")
    starts = e.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("delta"), "event_id"
    )
    ends = e.select("event_type", end_t.alias("t"), F.lit(-1).alias("delta"), "event_id")
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    r = starts.unionAll(ends).select(
        "event_type", "delta", F.sum("delta").over(w).alias("conc")
    )
    return r.groupBy("event_type").agg(
        F.max("conc").alias("max_concurrent"),
        F.count(F.when(F.col("delta") == 1, 1)).alias("n_intervals"),
    )


@q(
    "order_streak_islands",
    """
    WITH m AS (
      SELECT DISTINCT o_custkey,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS mo
      FROM orders
    ), g AS (
      SELECT o_custkey,
             mo - DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY mo) AS grp
      FROM m
    ), islands AS (
      SELECT o_custkey, grp, COUNT(*) AS streak FROM g GROUP BY o_custkey, grp
    ), best AS (
      SELECT o_custkey, MAX(streak) AS best_streak FROM islands GROUP BY o_custkey
    )
    SELECT CAST(best_streak AS BIGINT) AS streak_months,
           COUNT(*) AS n_customers
    FROM best
    GROUP BY best_streak
    """,
)
def order_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest run of consecutive active months per
    customer (month_index − dense_rank is constant within an island),
    then the distribution of best streaks. Pure integer arithmetic —
    no float determinism concerns. All four stages key on o_custkey
    (the DISTINCT, the rank window, and both island aggs), so
    Catalyst reuses ONE hash partitioning for them; only the final
    tiny distribution agg re-shuffles."""
    o = load(spark, sf_dir, "orders")
    m = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("bigint")
        .alias("mo"),
    ).distinct()
    grp = F.col("mo") - F.dense_rank().over(
        Window.partitionBy("o_custkey").orderBy("mo")
    )
    islands = (
        m.select("o_custkey", grp.alias("grp"))
        .groupBy("o_custkey", "grp")
        .agg(F.count("*").alias("streak"))
    )
    best = islands.groupBy("o_custkey").agg(F.max("streak").alias("best_streak"))
    return best.groupBy(F.col("best_streak").alias("streak_months")).agg(
        F.count("*").alias("n_customers")
    )


@q(
    "rfm_customer_segments",
    """
    WITH agg AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS freq,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS monetary
      FROM orders
      GROUP BY o_custkey
    ), scored AS (
      SELECT o_custkey,
             NTILE(4) OVER (ORDER BY last_order DESC, o_custkey) AS r_score,
             NTILE(4) OVER (ORDER BY freq DESC, o_custkey) AS f_score,
             NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
      FROM agg
    )
    SELECT r_score, f_score, m_score, COUNT(*) AS n_customers
    FROM scored
    GROUP BY r_score, f_score, m_score
    """,
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency/frequency/monetary quartiles via
    NTILE, then segment sizes. Each NTILE orders by a unique
    (metric, custkey) pair so bucket boundaries are identical across
    engines; monetary goes through the exact-decimal sum. The three
    global NTILEs are the scale hazard (single-partition sort) — at
    100 TB you'd swap them for percentile-bound lookups
    (approx quantiles broadcast back, as operators/skew.py does);
    here they run over the already-aggregated per-customer frame,
    1/40th of the fact rows."""
    o = load(spark, sf_dir, "orders")
    agg = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("freq"),
        _dsum(F.col("o_totalprice"), "monetary"),
    )
    scored = agg.select(
        F.ntile(4)
        .over(Window.orderBy(F.col("last_order").desc(), F.col("o_custkey")))
        .alias("r_score"),
        F.ntile(4)
        .over(Window.orderBy(F.col("freq").desc(), F.col("o_custkey")))
        .alias("f_score"),
        F.ntile(4)
        .over(Window.orderBy(F.col("monetary").desc(), F.col("o_custkey")))
        .alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").alias("n_customers")
    )


@q(
    "basket_brand_lift",
    """
    WITH ob AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ), bc AS (
      SELECT p_brand, COUNT(*) AS cnt FROM ob GROUP BY p_brand
    ), n AS (
      SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM ob
    ), pairs AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
             COUNT(*) AS pair_orders
      FROM ob a JOIN ob b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY a.p_brand, b.p_brand
    )
    SELECT brand_a, brand_b, pair_orders,
           ROUND(CAST(pair_orders AS DOUBLE) * CAST(n_orders AS DOUBLE)
                 / (CAST(ca.cnt AS DOUBLE) * CAST(cb.cnt AS DOUBLE)), 6) AS lift
    FROM pairs CROSS JOIN n
    JOIN bc ca ON ca.p_brand = brand_a
    JOIN bc cb ON cb.p_brand = brand_b
    """,
)
def basket_brand_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence mining: for every brand pair, how
    many orders contain both, and the lift P(a,b)/(P(a)·P(b)) over
    independence. Lift is computed from exact integer counts through
    one identical double expression (round 6), so no float-sum
    drift. Scale shape: the (order, brand) distinct and the
    self-join share the same l_orderkey hash partitioning — the pair
    explosion happens within co-located partitions and only the
    ≤brand² pair aggregate crosses the wire; brand marginals and the
    1-row total broadcast back onto it."""
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    bc = ob.groupBy("p_brand").agg(F.count("*").alias("cnt"))
    n = ob.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    a, b = ob.alias("a"), ob.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"),
            F.col("b.p_brand").alias("brand_b"),
        )
        .agg(F.count("*").alias("pair_orders"))
    )
    ca = bc.select(F.col("p_brand").alias("ba"), F.col("cnt").alias("cnt_a"))
    cb = bc.select(F.col("p_brand").alias("bb"), F.col("cnt").alias("cnt_b"))
    return (
        pairs.crossJoin(F.broadcast(n))
        .join(F.broadcast(ca), F.col("brand_a") == F.col("ba"))
        .join(F.broadcast(cb), F.col("brand_b") == F.col("bb"))
        .select(
            "brand_a",
            "brand_b",
            "pair_orders",
            F.round(
                F.col("pair_orders").cast("double")
                * F.col("n_orders").cast("double")
                / (F.col("cnt_a").cast("double") * F.col("cnt_b").cast("double")),
                6,
            ).alias("lift"),
        )
    )


@q(
    "pareto_abc_customers",
    """
    WITH rev AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS rev
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT o_custkey, rev,
             SUM(rev) OVER (ORDER BY rev DESC, o_custkey
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(rev) OVER () AS total
      FROM rev
    ), classed AS (
      SELECT CASE WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 0.8
                  THEN 'A'
                  WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 0.95
                  THEN 'B' ELSE 'C' END AS abc_class,
             rev, total
      FROM ranked
    )
    SELECT abc_class,
           COUNT(*) AS n_customers,
           ROUND(CAST(SUM(rev) AS DOUBLE) / CAST(MAX(total) AS DOUBLE), 6)
             AS revenue_share
    FROM classed
    GROUP BY abc_class
    """,
)
def pareto_abc_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC classification: rank customers by revenue, running
    decimal cumsum over a UNIQUE (rev desc, custkey) order, class A/B/C
    at 80%/95% of total. The cumsum stays in exact decimal so the
    classification boundary is order-stable; only the final share
    ratio goes through (identical) double division. The global
    ordered window is the scale hazard — it runs over the per-customer
    aggregate (40× smaller than orders); at 100 TB you'd range-
    partition by rev and seed each partition with the preceding
    partitions' decimal subtotals."""
    o = load(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(28,4)")).alias("rev")
    )
    wcum = Window.orderBy(F.col("rev").desc(), F.col("o_custkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = rev.select(
        "rev",
        F.sum("rev").over(wcum).alias("cum"),
        F.sum("rev").over(Window.partitionBy()).alias("total"),
    )
    ratio = F.col("cum").cast("double") / F.col("total").cast("double")
    classed = ranked.select(
        F.when(ratio <= 0.8, "A").when(ratio <= 0.95, "B").otherwise("C").alias(
            "abc_class"
        ),
        "rev",
        "total",
    )
    return classed.groupBy("abc_class").agg(
        F.count("*").alias("n_customers"),
        F.round(
            F.sum("rev").cast("double") / F.max("total").cast("double"), 6
        ).alias("revenue_share"),
    )


@q(
    "event_type_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), c AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS transitions
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, transitions,
           ROUND(CAST(transitions AS DOUBLE)
                 / CAST(SUM(transitions) OVER (PARTITION BY prev_type)
                        AS DOUBLE), 6) AS prob
    FROM c
    """,
)
def event_type_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user event streams:
    count and row-normalized probability of each type→type step.
    The LAG order is unique per user ((ts, event_id) tiebreak), counts
    are exact integers, and the normalizing window runs over the
    ~|types|² aggregate, not the event stream. One shuffle on user_id
    for the sequence window, one for the tiny pair aggregate — the
    per-user ordering is exactly the partitioning a sessionized event
    store would already have."""
    e = load(spark, sf_dir, "events")
    seq = e.select(
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    )
    c = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("transitions"))
    )
    row_tot = F.sum("transitions").over(Window.partitionBy("prev_type"))
    return c.select(
        "prev_type",
        "next_type",
        "transitions",
        F.round(
            F.col("transitions").cast("double") / row_tot.cast("double"), 6
        ).alias("prob"),
    )


@q(
    "moments_skew_kurtosis",
    """
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS s2,
             CAST(SUM(CAST(l_quantity * l_quantity * l_quantity
                           AS DECIMAL(28,4))) AS DOUBLE) AS s3,
             CAST(SUM(CAST(l_quantity * l_quantity * l_quantity * l_quantity
                           AS DECIMAL(28,4))) AS DOUBLE) AS s4
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           ROUND((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
                 / POWER(s2 / n - (s1 / n) * (s1 / n), 1.5), 6) AS skew_pop,
           ROUND((s4 / n - 4 * (s1 / n) * (s3 / n)
                  + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                  - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
                 / ((s2 / n - (s1 / n) * (s1 / n))
                    * (s2 / n - (s1 / n) * (s1 / n))) - 3, 6) AS kurt_excess
    FROM s
    """,
)
def moments_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis from exact raw-moment
    sums — the same exact-component-sum trick corr_regression uses,
    closing the gap stats_dispersion documents (built-in one-pass
    skewness/kurtosis can't hash-match across engines). l_quantity is
    integer-valued ≤50, so x…x⁴ are exact in DECIMAL(28,4); the
    moment combination is one identical double expression both sides.
    Still a single map-side-combining hash aggregate: four sums ride
    the same one-exchange plan as any groupBy."""
    l = load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    agg = l.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x.cast("decimal(28,4)")).cast("double").alias("s1"),
        F.sum((x * x).cast("decimal(28,4)")).cast("double").alias("s2"),
        F.sum((x * x * x).cast("decimal(28,4)")).cast("double").alias("s3"),
        F.sum((x * x * x * x).cast("decimal(28,4)")).cast("double").alias("s4"),
    )
    n = F.col("n")
    m1 = F.col("s1") / n
    m2 = F.col("s2") / n
    m3 = F.col("s3") / n
    m4 = F.col("s4") / n
    var_pop = m2 - m1 * m1
    skew = (m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1) / F.pow(var_pop, 1.5)
    kurt = (
        m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * m1 * m1 * m1 * m1
    ) / (var_pop * var_pop) - 3
    return agg.select(
        "l_returnflag",
        F.round(skew, 6).alias("skew_pop"),
        F.round(kurt, 6).alias("kurt_excess"),
    )


@q(
    "supplier_concentration_hhi",
    """
    WITH sup AS (
      SELECT s_nationkey, s_suppkey,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS rev
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_nationkey, s_suppkey
    ), sh AS (
      SELECT s_nationkey,
             CAST(rev AS DOUBLE)
             / CAST(SUM(rev) OVER (PARTITION BY s_nationkey) AS DOUBLE) AS share
      FROM sup
    )
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           ROUND(CAST(SUM(CAST(ROUND(share * share, 10) AS DECIMAL(28,12)))
                      AS DOUBLE), 6) AS hhi
    FROM sh JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration of supplier revenue within
    each nation — a skew diagnostic (HHI near 1/n = even load, near 1
    = one hot supplier; the same signal that decides when a join key
    needs salting). Revenue shares come from exact decimal sums, each
    share² is rounded to 10 digits before an exact decimal sum, so
    accumulation order is irrelevant. Supplier and nation dims
    broadcast; the only real exchange is the (nation, supplier)
    revenue rollup."""
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sup = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "s_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(28,6)"
                )
            ).alias("rev")
        )
    )
    share = F.col("rev").cast("double") / F.sum("rev").over(
        Window.partitionBy("s_nationkey")
    ).cast("double")
    term = F.round(share * share, 10).cast("decimal(28,12)")
    return (
        sup.select("s_nationkey", term.alias("term"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.sum("term").cast("double"), 6).alias("hhi"),
        )
    )


@q(
    "attribution_first_last_touch",
    """
    WITH u AS (
      SELECT user_id,
             min(struct_pack(t := ts, e := event_id, y := event_type)).y
               AS first_touch,
             max(struct_pack(t := ts, e := event_id, y := event_type)).y
               AS last_touch
      FROM events
      GROUP BY user_id
    )
    SELECT first_touch, last_touch, COUNT(*) AS n_users
    FROM u
    GROUP BY first_touch, last_touch
    """,
)
def attribution_first_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch/last-touch attribution: the event type that opened
    and closed each user's journey, then the user count per
    (first, last) combination. Struct-ordered MIN/MAX on the unique
    (ts, event_id) prefix replaces a per-user sort window — it keeps
    map-side partial aggregation, so the user rollup is one exchange
    of partial states rather than a full event-stream sort, exactly
    what you want when one user's history spans many input splits."""
    e = load(spark, sf_dir, "events")
    s = F.struct(
        F.col("ts").alias("t"),
        F.col("event_id").alias("e"),
        F.col("event_type").alias("y"),
    )
    u = e.groupBy("user_id").agg(
        F.min(s).getField("y").alias("first_touch"),
        F.max(s).getField("y").alias("last_touch"),
    )
    return u.groupBy("first_touch", "last_touch").agg(
        F.count("*").alias("n_users")
    )


@q(
    "q17_small_quantity_revenue",
    """
    WITH thr AS (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                    / COUNT(*)) AS lim
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN thr t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#12' AND p.p_size < 15 AND l.l_quantity < t.lim
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (container swapped for p_size — testdata has
    no p_container): revenue of small-quantity orders, where "small"
    is a correlated per-part threshold (0.2 × that part's average
    quantity). Plan: the threshold is a pre-aggregation joined back
    on partkey — Catalyst decorrelates to exactly this — and the
    part dimension broadcasts. avg via exact decimal sum / count so
    the float threshold is bit-identical cross-engine."""
    li = load(spark, sf_dir, "lineitem")
    thr = li.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
                / F.count("*")
            )
        ).alias("lim")
    )
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#12") & (F.col("p_size") < 15)
    )
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(thr, "l_partkey")
        .filter(F.col("l_quantity") < F.col("lim"))
    )
    return j.agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(28,6)")).cast("double")
            / F.lit(7.0)
        )
        .cast("double")
        .alias("avg_yearly"),
        F.count("*").alias("n_rows"),
    )


@q(
    "q19_disjunctive_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of predicate triples spanning
    both join sides. The part side broadcasts; Catalyst extracts the
    common join key so the OR does not force a nested-loop join, and
    per-side conjuncts (p_size ranges, l_quantity ranges) still push
    toward the scans."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(cond).agg(
        F.sum(
            (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
                "decimal(28,6)"
            )
        )
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_rows"),
    )


@q(
    "scd2_customer_versions",
    """
    WITH cur AS (
      SELECT c_custkey, c_acctbal,
             TIMESTAMP '2020-01-01 00:00:00' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to
      FROM customer
    ), upd AS (
      SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal
      FROM customer WHERE c_custkey % 13 = 0
    )
    SELECT c_custkey, c_acctbal, valid_from, valid_to FROM cur
    WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
    UNION ALL
    SELECT c_custkey, c_acctbal, valid_from,
           TIMESTAMP '2024-06-01 00:00:00' AS valid_to
    FROM cur WHERE c_custkey IN (SELECT c_custkey FROM upd)
    UNION ALL
    SELECT c_custkey, c_acctbal,
           TIMESTAMP '2024-06-01 00:00:00' AS valid_from,
           CAST(NULL AS TIMESTAMP) AS valid_to
    FROM upd
    """,
)
def scd2_customer_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension (operators/merge.scd2_apply):
    an account-balance update batch applied to a versioned customer
    dimension — live rows with a batch key are CLOSED (valid_to =
    batch ts), batch rows OPEN new live versions, history passes
    through. One left-semi/anti pair + unions: single-shuffle CDC."""
    from datasette_upload_csvs_spark.operators import merge

    c = load(spark, sf_dir, "customer")
    cur = c.select(
        "c_custkey",
        "c_acctbal",
        F.lit("2020-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    upd = c.filter(F.pmod("c_custkey", F.lit(13)) == 0).select(
        "c_custkey", (F.col("c_acctbal") + F.lit(100.0)).alias("c_acctbal")
    )
    return merge.scd2_apply(
        cur,
        upd,
        keys=["c_custkey"],
        batch_ts=F.lit("2024-06-01 00:00:00").cast("timestamp"),
    )


@q(
    "hll_mergeable_distinct",
    """
    SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact,
           TRUE AS sketch_ok
    FROM orders
    """,
)
def hll_mergeable_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count sketches — the pattern that makes
    100 TB distinct counts incremental: build one Datasketches HLL
    per o_orderstatus partition slice (hll_sketch_agg, a few KB
    each), union the sketches (hll_union_agg), estimate once. At
    scale the per-slice sketches are precomputed per day/partition
    and the union costs KB, not a rescan. Gate: the merged estimate
    lands within 5% of the exact distinct (sketch internals aren't
    cross-engine comparable, so the oracle pins exact + verdict)."""
    o = load(spark, sf_dir, "orders")
    exact = o.agg(F.countDistinct("o_custkey").alias("n")).collect()[0]["n"]
    part = o.groupBy("o_orderstatus").agg(
        F.expr("hll_sketch_agg(o_custkey)").alias("sk")
    )
    est = part.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    ).collect()[0]["est"]
    ok = exact > 0 and abs(est / exact - 1.0) <= 0.05
    return spark.createDataFrame(
        [(exact, ok)], "n_exact bigint, sketch_ok boolean"
    )


@q(
    "approx_percentile_gate",
    "SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, TRUE AS p50_ok, TRUE AS p95_ok "
    "FROM lineitem",
)
def approx_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketch (approx_percentile, accuracy 10000) validated
    by RANK, not value: the approximate p50/p95 of l_extendedprice
    must sit within ±1% of the true CDF position. Sketch outputs
    aren't bit-comparable across engines, so the oracle pins the
    row count and the verdicts."""
    li = load(spark, sf_dir, "lineitem").select("l_extendedprice")
    r = li.agg(
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.95), 10000)"
        ).alias("ap"),
        F.count("*").alias("n"),
    ).collect()[0]
    p50, p95 = r["ap"][0], r["ap"][1]
    n = r["n"]
    ranks = li.agg(
        F.sum((F.col("l_extendedprice") <= p50).cast("long")).alias("r50"),
        F.sum((F.col("l_extendedprice") <= p95).cast("long")).alias("r95"),
    ).collect()[0]
    p50_ok = abs(ranks["r50"] / n - 0.5) <= 0.01
    p95_ok = abs(ranks["r95"] / n - 0.95) <= 0.01
    return spark.createDataFrame(
        [(n, p50_ok, p95_ok)], "n_rows bigint, p50_ok boolean, p95_ok boolean"
    )


# ====================================================================
# deterministic content-defined sampling (operators/sampling.py)
# ====================================================================


@q(
    "sample_deterministic",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE CAST(md5_number_lower(CAST(o_orderkey AS VARCHAR)) AS DOUBLE)
          / 18446744073709551616.0 < 0.1
    """,
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% sample of orders chosen by content hash of the key —
    reproducible across runs, engines, partitionings, and
    incremental reprocessing, unlike RNG-seeded sample(). Map-side
    filter, no shuffle; the oracle recomputes the identical
    md5-low-64 verdict."""
    from datasette_upload_csvs_spark.operators import sampling

    return sampling.deterministic_sample(
        load(spark, sf_dir, "orders"), "o_orderkey", 0.1
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@q(
    "sample_stratified",
    """
    WITH keyed AS (
      SELECT l_orderkey, l_linenumber, l_returnflag,
             CAST(md5_number_lower(CAST(l_orderkey AS VARCHAR) || '-' ||
                                   CAST(l_linenumber AS VARCHAR)) AS DOUBLE)
               / 18446744073709551616.0 AS sk
      FROM lineitem
    )
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_sampled
    FROM keyed
    WHERE sk < (CASE l_returnflag WHEN 'A' THEN 0.05
                                  WHEN 'N' THEN 0.2
                                  WHEN 'R' THEN 0.5 ELSE 0.0 END)
    GROUP BY l_returnflag
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling (sampleBy's contract made
    reproducible): different keep-rates per l_returnflag, one
    map-side filter, verified by per-stratum sampled counts."""
    from datasette_upload_csvs_spark.operators import sampling

    li = load(spark, sf_dir, "lineitem").withColumn(
        "rk", F.concat_ws("-", "l_orderkey", "l_linenumber")
    )
    out = sampling.stratified_sample(
        li, "rk", "l_returnflag", {"A": 0.05, "N": 0.2, "R": 0.5}
    )
    return out.groupBy("l_returnflag").agg(F.count("*").alias("n_sampled"))


@q(
    "merge_upsert_orders",
    """
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ), updates AS (
      SELECT o_orderkey, 'U' AS o_orderstatus,
             o_totalprice + 10.0 AS o_totalprice
      FROM base WHERE o_orderkey % 97 = 0
      UNION ALL
      SELECT o_orderkey + 10000000, 'I', 100.0
      FROM base WHERE o_orderkey % 101 = 0
    )
    SELECT * FROM base
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
    UNION ALL
    SELECT * FROM updates
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE semantics as a pure relation (operators/merge.py):
    an update batch (modified rows + brand-new keys) applied over
    the orders snapshot — anti-join keeps unsuperseded rows, union
    appends the batch. One shuffle, no per-column coalesce. The
    in-place table variant (merge_upsert, staging swap) is pinned
    by tests/test_merge.py."""
    from datasette_upload_csvs_spark.operators import merge

    base = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    upd = base.filter(F.pmod("o_orderkey", F.lit(97)) == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + F.lit(10.0)).alias("o_totalprice"),
    )
    new = base.filter(F.pmod("o_orderkey", F.lit(101)) == 0).select(
        (F.col("o_orderkey") + F.lit(10000000)).alias("o_orderkey"),
        F.lit("I").alias("o_orderstatus"),
        F.lit(100.0).alias("o_totalprice"),
    )
    return merge.merge_upsert_frames(
        base, upd.unionByName(new), ["o_orderkey"]
    )


@q(
    "sample_weighted_orders",
    """
    WITH scored AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             pow(CAST(md5_number_lower(CAST(o_orderkey AS VARCHAR)) AS DOUBLE)
                 / 18446744073709551616.0,
                 1.0 / o_totalprice) AS ws
      FROM orders
    )
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM scored ORDER BY ws DESC, o_orderkey ASC LIMIT 100
    """,
)
def sample_weighted_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample without replacement (Efraimidis–Spirakis
    A-Res): 100 orders with inclusion probability ∝ o_totalprice,
    the 'draw' being the content hash — reproducible cross-engine.
    Map-side score + TakeOrderedAndProject top-k; no full sort."""
    from datasette_upload_csvs_spark.operators import sampling

    return sampling.weighted_sample(
        load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        ),
        "o_orderkey",
        "o_totalprice",
        100,
    )


@q(
    "sample_n_per_group_orders",
    """
    WITH ranked AS (
      SELECT o_orderkey, o_orderstatus,
             row_number() OVER (
               PARTITION BY o_orderstatus
               ORDER BY CAST(md5_number_lower(CAST(o_orderkey AS VARCHAR))
                             AS DOUBLE) / 18446744073709551616.0 ASC,
                        o_orderkey ASC) AS rn
      FROM orders
    )
    SELECT o_orderkey, o_orderstatus FROM ranked WHERE rn <= 5
    """,
)
def sample_n_per_group_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 5 rows per order status, chosen by content-hash order:
    sampleBy with exact per-group counts, deterministic. One shuffle
    on the group key with WindowGroupLimit pruning to n map-side."""
    from datasette_upload_csvs_spark.operators import sampling

    return sampling.sample_n_per_group(
        load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus"),
        "o_orderkey",
        "o_orderstatus",
        5,
    )


@q(
    "equidepth_histogram_price",
    """
    WITH binned AS (
      SELECT o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
      FROM orders
    )
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
    FROM binned GROUP BY bin
    """,
)
def equidepth_histogram_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (equal row counts per bin, data-dependent
    edges) — the summary that stays informative under skew, where
    equi-width bins collapse into one hot bucket. NTILE over a
    unique total order is deterministic; at scale the single-sort
    ntile would be replaced by approx_percentile edges + a bin join,
    but the exact form is the oracle-checkable contract."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_totalprice", F.ntile(10).over(w).alias("bin"))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@q(
    "doc_rolling_hash",
    f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                 x -> x <> '') AS t
      FROM documents
    ), hs AS (
      SELECT doc_id,
             list_transform(t, x ->
               CAST(md5_number_lower(x) % 2147483647 AS BIGINT)) AS hs
      FROM toks
    )
    SELECT doc_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT), hs),
                       (a, b) -> (a * 131 + b) % 2147483647) AS rolling_hash
    FROM hs
    """,
)
def doc_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash fingerprint (Rabin–Karp shape): fold
    acc = (acc*B + h(token)) mod P over the token stream — the
    order-SENSITIVE fingerprint that complements the sorted-token
    text_fingerprint (same tokens reordered hash differently). The
    per-token hash is md5-low-64 (portable), so the whole chain is
    engine-independent; one map-side fold, no shuffle."""
    from datasette_upload_csvs_spark.functions.text import tokens as _toks
    from datasette_upload_csvs_spark.operators.export import md5_low64

    P = 2147483647
    d = load(spark, sf_dir, "documents")
    hs = F.transform(
        _toks(F.col("text")),
        lambda t: F.pmod(md5_low64(t), F.lit(P)).cast("long"),
    )
    rh = F.aggregate(
        hs,
        F.lit(0).cast("long"),
        lambda acc, h: F.pmod(acc * F.lit(131) + h, F.lit(P)),
    )
    return d.select("doc_id", rh.alias("rolling_hash"))


@q(
    "filtered_aggregates",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_all,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
             AS n_finished,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4)))
                FILTER (WHERE o_totalprice > 100000) AS DOUBLE)
             AS big_revenue
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def filtered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI FILTER (WHERE ...) aggregate clauses — conditional
    aggregation without CASE contortions, one pass, still map-side
    partial-agg friendly."""
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_all,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4)))
                    FILTER (WHERE o_totalprice > 100000) AS DOUBLE)
                 AS big_revenue
        FROM {orders}
        GROUP BY o_orderpriority
        """,
        orders=load(spark, sf_dir, "orders"),
    )


@q(
    "monthly_revenue_ewma",
    """
    WITH mo AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS x
      FROM orders GROUP BY 1
    ), agg AS (
      SELECT list(x ORDER BY month) AS xs, list(month ORDER BY month) AS ms
      FROM mo
    )
    SELECT CAST(ms[i] AS DATE) AS month,
           round(xs[i], 2) AS revenue,
           round(list_reduce(list_slice(xs, 1, i),
                             (a, b) -> 0.2 * b + 0.8 * a), 6) AS ewma
    FROM agg, UNNEST(range(1, len(xs) + 1)) AS u(i)
    """,
)
def monthly_revenue_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average over the monthly revenue
    series (alpha=0.2): the recursive smoother windows can't express
    (state depends on the previous OUTPUT). The series is bounded
    (months), so it collects to one array row and each point's EWMA
    is a prefix fold — identical fold order on both engines, so the
    floats match bit-for-bit. For unbounded per-key series the same
    fold runs inside applyInPandas per key instead."""
    o = load(spark, sf_dir, "orders")
    mo = o.groupBy(F.trunc("o_orderdate", "month").alias("month")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(28,4)"))
        .cast("double")
        .alias("x")
    )
    agg = mo.agg(
        F.array_sort(F.collect_list(F.struct("month", "x"))).alias("mx")
    ).select(
        F.expr("transform(mx, e -> e.x)").alias("xs"),
        F.expr("transform(mx, e -> e.month)").alias("ms"),
    )
    return agg.select(
        F.explode(F.expr("sequence(1, size(xs))")).alias("i"), "xs", "ms"
    ).select(
        F.expr("element_at(ms, i)").alias("month"),
        F.round(F.expr("element_at(xs, i)"), 2).alias("revenue"),
        F.round(
            F.expr(
                "aggregate(slice(xs, 2, i - 1), element_at(xs, 1),"
                " (acc, x) -> 0.2 * x + 0.8 * acc)"
            ),
            6,
        ).alias("ewma"),
    )


@q(
    "dq_check_orders",
    """
    SELECT 'not_null_o_custkey' AS rule,
           CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
             AS violations FROM orders
    UNION ALL
    SELECT 'accepted_values_o_orderstatus',
           CAST(COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P'))
                AS BIGINT) FROM orders
    UNION ALL
    SELECT 'in_range_o_totalprice',
           CAST(COUNT(*) FILTER (WHERE o_totalprice IS NULL
                                 OR o_totalprice < 0
                                 OR o_totalprice > 1000000) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'unique_o_orderkey',
           CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
    FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey
          HAVING COUNT(*) > 1)
    UNION ALL
    SELECT 'ref_o_custkey',
           CAST(COUNT(*) AS BIGINT)
    FROM orders WHERE o_custkey IS NOT NULL
      AND o_custkey NOT IN (SELECT c_custkey FROM customer)
    """,
)
def dq_check_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (operators/quality.py): N
    row-level rules share ONE scan (conditional sums + stack),
    uniqueness is one grouped agg, referential integrity one
    broadcast anti-join. The oracle recomputes every rule in SQL."""
    from datasette_upload_csvs_spark.operators import quality as DQ

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return DQ.check(
        o,
        [
            DQ.not_null("o_custkey"),
            DQ.accepted_values("o_orderstatus", ["O", "F", "P"]),
            DQ.in_range("o_totalprice", 0, 1000000),
            DQ.unique("o_orderkey"),
            DQ.references("o_custkey", c, "c_custkey"),
        ],
    )


@q(
    "snapshot_diff_orders",
    """
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ), new AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 10.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 101 <> 0
      UNION ALL
      SELECT o_orderkey + 10000000, 'I', 100.0
      FROM orders WHERE o_orderkey % 89 = 0
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                  OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
                  THEN 'changed'
                ELSE 'unchanged' END AS diff_status
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level snapshot diff (operators/merge.snapshot_diff): one
    full-outer key join classifying every key added / removed /
    changed / unchanged — the audit of what a merge or CDC feed
    actually did. Content equality via a digest of the non-key
    struct (one expression regardless of column count); the oracle
    compares columns directly with IS DISTINCT FROM — same verdict."""
    from datasette_upload_csvs_spark.operators import merge

    base = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    modified = base.filter(F.pmod("o_orderkey", F.lit(101)) != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.pmod("o_orderkey", F.lit(97)) == 0,
            F.col("o_totalprice") + F.lit(10.0),
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    added = base.filter(F.pmod("o_orderkey", F.lit(89)) == 0).select(
        (F.col("o_orderkey") + F.lit(10000000)).alias("o_orderkey"),
        F.lit("I").alias("o_orderstatus"),
        F.lit(100.0).alias("o_totalprice"),
    )
    return merge.snapshot_diff(
        base, modified.unionByName(added), ["o_orderkey"]
    )


@q(
    "benford_first_digit",
    """
    WITH d AS (
      SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                            1, 1) AS INTEGER) AS digit
      FROM orders WHERE o_totalprice >= 1
    ), n AS (SELECT COUNT(*) AS total FROM d)
    SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs,
           round(CAST(COUNT(*) AS DOUBLE) / total, 6) AS p_obs,
           round(log10(1.0 + 1.0 / digit), 6) AS p_benford
    FROM d CROSS JOIN n
    GROUP BY digit, total
    """,
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit distribution vs Benford's law — the classic
    anomaly screen for fabricated numeric data. Digit extraction
    goes through an explicit floor() + bigint (DuckDB's double→int
    CAST rounds while Spark's truncates, and double→VARCHAR uses
    scientific notation; floored-integer formatting is identical). Map-side digit + one small agg."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    total = d.count()
    return d.groupBy("digit").agg(
        F.count("*").alias("n_obs"),
        F.round(F.count("*") / F.lit(float(total)), 6).alias("p_obs"),
        F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias("p_benford"),
    )


@q(
    "not_in_null_semantics",
    """
    SELECT
      CAST((SELECT COUNT(*) FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                    UNION ALL SELECT NULL)) AS BIGINT)
        AS not_in_with_null,
      CAST((SELECT COUNT(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey)) AS BIGINT)
        AS not_exists_count
    """,
)
def not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN null trap, pinned: a single NULL in the subquery
    makes `x NOT IN (...)` never-true (three-valued logic), while
    NOT EXISTS keeps counting — both engines must agree on BOTH
    counts (0 and the true anti-join count). The reason anti_join
    queries in this engine always use left_anti, never NOT IN."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("_c_nin")
    load(spark, sf_dir, "orders").createOrReplaceTempView("_o_nin")
    return spark.sql(
        """
        SELECT
          (SELECT COUNT(*) FROM _c_nin
           WHERE c_custkey NOT IN (SELECT o_custkey FROM _o_nin
                                   UNION ALL SELECT NULL)) AS not_in_with_null,
          (SELECT COUNT(*) FROM _c_nin c
           WHERE NOT EXISTS (SELECT 1 FROM _o_nin o
                             WHERE o.o_custkey = c.c_custkey)) AS not_exists_count
        """
    )


@q(
    "histogram2d_qty_price",
    """
    SELECT CAST(floor((l_quantity - 1.0) / 5.0) AS INTEGER) AS qty_bin,
           CAST(floor(l_extendedprice / 10000.0) AS INTEGER) AS price_bin,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def histogram2d_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D histogram (heatmap binning) over quantity × price: fixed-
    width bins via floor arithmetic (explicit floor — never a
    double→int cast, whose rounding differs across engines). One
    map-side projection + one small agg; the density surface that
    feeds outlier maps and join-selectivity estimates."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.floor((F.col("l_quantity") - F.lit(1.0)) / F.lit(5.0))
            .cast("int")
            .alias("qty_bin"),
            F.floor(F.col("l_extendedprice") / F.lit(10000.0))
            .cast("int")
            .alias("price_bin"),
        )
        .groupBy("qty_bin", "price_bin")
        .agg(F.count("*").alias("n"))
    )


@q(
    "monthly_trend_by_nation",
    """
    WITH mo AS (
      SELECT n.n_name,
             CAST(date_diff('month', DATE '1992-01-01',
                            date_trunc('month', o.o_orderdate)) AS BIGINT)
               AS xm,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS y
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    ), comp AS (
      SELECT n_name,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xm) AS BIGINT) AS sx,
             CAST(SUM(xm * xm) AS BIGINT) AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(28,4))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(xm * y AS DECIMAL(28,4))) AS DOUBLE) AS sxy
      FROM mo GROUP BY n_name
    )
    SELECT n_name, n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                 / n, 6) AS intercept
    FROM comp
    """,
)
def monthly_trend_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped OLS trend: revenue slope/intercept per nation over
    month index — linear regression decomposed into exact component
    sums (counts, Σx, Σx², decimal Σy, decimal Σxy) so every group's
    fit is map-side partial-agg friendly AND bit-identical
    cross-engine (a built-in regr_slope sums doubles in partition
    order — never hash-matches). Two broadcast dims + two small
    aggs."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    mo = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "n_name",
            (
                (F.year(F.trunc("o_orderdate", "month")) - F.lit(1992))
                * F.lit(12)
                + F.month(F.trunc("o_orderdate", "month"))
                - F.lit(1)
            )
            .cast("bigint")
            .alias("xm"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(28,4)"))
            .cast("double")
            .alias("y")
        )
    )
    comp = mo.groupBy("n_name").agg(
        F.count("*").alias("n"),
        F.sum("xm").alias("sx"),
        F.sum(F.col("xm") * F.col("xm")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(28,4)")).cast("double").alias("sy"),
        F.sum((F.col("xm") * F.col("y")).cast("decimal(28,4)"))
        .cast("double")
        .alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return comp.select(
        "n_name",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    )


@q(
    "price_percentiles_by_status",
    """
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders GROUP BY o_orderstatus
    """,
)
def price_percentiles_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped percentiles (linear interpolation — Spark
    percentile() and DuckDB quantile_cont share the formula; round-4
    absorbs the last-ulp of the interpolation arithmetic). Exact
    percentile is a per-group sort: fine per status group; the
    sketch path for wide groups is approx_percentile_gate."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
    )


@q(
    "robust_dispersion_mad",
    """
    WITH med AS (
      SELECT quantile_cont(o_totalprice, 0.5) AS m FROM orders
    )
    SELECT round(med.m, 4) AS median_price,
           round(quantile_cont(abs(o_totalprice - med.m), 0.5), 4) AS mad,
           round(quantile_cont(abs(o_totalprice - med.m), 0.5) * 1.4826, 4)
             AS sigma_robust
    FROM orders CROSS JOIN med
    GROUP BY med.m
    """,
)
def robust_dispersion_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation — the outlier-immune dispersion
    measure (stddev is itself corrupted by the outliers you're
    hunting; MAD×1.4826 estimates σ robustly). Two exact-percentile
    passes: the median is a 1-row cross join back into the absolute
    deviations — no collect, both passes distribute."""
    o = load(spark, sf_dir, "orders")
    med = o.agg(F.expr("percentile(o_totalprice, 0.5)").alias("m"))
    dev = o.crossJoin(F.broadcast(med))
    return dev.groupBy("m").agg(
        F.round(F.first("m"), 4).alias("median_price"),
        F.round(F.expr("percentile(abs(o_totalprice - m), 0.5)"), 4).alias(
            "mad"
        ),
        F.round(
            F.expr("percentile(abs(o_totalprice - m), 0.5)") * F.lit(1.4826),
            4,
        ).alias("sigma_robust"),
    ).drop("m")


# ====================================================================
# TPC-H Q11 / Q16 (round 4: completes the 22-query suite; no
# partsupp table in the testdata, so the "stock book" is derived
# from lineitem as in q2_min_cost_supplier)
# ====================================================================


@q(
    "q11_important_stock",
    """
    WITH stock AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,4)))
                  AS DOUBLE) AS value
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY l_partkey
    )
    SELECT l_partkey AS ps_partkey, ROUND(value, 2) AS part_value
    FROM stock
    WHERE value > (SELECT CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)
                          * 0.001 FROM stock)
    ORDER BY part_value DESC, ps_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification; reference
    delegates to SQLite — SURVEY §2 B27 scalar subquery): per-part
    stock value for one nation's suppliers, kept when above a
    fraction of the nation's total. The HAVING-over-global-scalar is
    a 1-row broadcast cross join against the reused `stock`
    aggregate — Spark computes the grouped agg once per branch but
    both are map-side partial sums on the same shuffle key; decimal
    partial sums keep the threshold bit-identical cross-engine. At
    100 TB the nation filter reaches the scan via the broadcast hash
    join on the (tiny) supplier×nation dim."""
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    dim = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey"
    )
    stock = (
        l.join(F.broadcast(dim), l.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_quantity")).cast(
                    "decimal(28,4)"
                )
            )
            .cast("double")
            .alias("value")
        )
        # referenced by both the per-part branch and the global
        # threshold: without persist Catalyst re-derives the agg —
        # and re-scans lineitem — once per branch (no automatic CTE
        # materialization). The persisted frame is one row per part,
        # not fact data; bench/driver clearCache reclaims it.
        .persist()
    )
    total = stock.agg(
        (
            F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
            * F.lit(0.001)
        ).alias("threshold")
    )
    return (
        stock.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.round("value", 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "ps_partkey")
    )


@q(
    "q16_parts_supplier_count",
    """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#3'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship; the complaint
    exclusion keys on s_acctbal < 0 — the testdata supplier table
    has no comment column). NOT IN over a non-null key compiles to a
    broadcast left-anti join; the part-attribute filters prune at
    the part scan before the join; COUNT(DISTINCT) shuffles on the
    (brand, type, size) group key — the standard two-phase distinct
    aggregate at scale."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    l = load(spark, sf_dir, "lineitem")
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ====================================================================
# Curation operators (round 4): the passes between "raw documents"
# and "tokenizer-ready shards" — repetition filters, boilerplate
# strip, sequence packing, PII scrub, mixture rebalance, shuffle
# order. operators/curation.py holds the implementations.
# ====================================================================

from datasette_upload_csvs_spark.operators.curation import (  # noqa: E402
    EMAIL_RE as _EMAIL_RE_SQL,
    PHONE_RE as _PHONE_RE_SQL,
)
from datasette_upload_csvs_spark.operators.export import (  # noqa: E402
    md5_low64 as _md5_low64,
)


@q(
    "curation_repetition_stats",
    f"""
    WITH t AS (
      SELECT doc_id, list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                 x -> x <> '') AS tok
      FROM documents
    ), w AS (
      SELECT doc_id, tok2, COUNT(*) AS cnt
      FROM (SELECT doc_id, unnest(tok) AS tok2 FROM t) GROUP BY 1, 2
    ), ws AS (
      SELECT doc_id, SUM(cnt) AS n_words, MAX(cnt) AS top_cnt,
             COUNT(*) AS n_distinct
      FROM w GROUP BY 1
    ), bg AS (
      SELECT doc_id, b, COUNT(*) AS cnt
      FROM (SELECT doc_id,
                   unnest(list_transform(range(1, len(tok)),
                                         i -> tok[i] || ' ' || tok[i+1])) AS b
            FROM t) GROUP BY 1, 2
    ), bs AS (
      SELECT doc_id, SUM(cnt) AS n_bigrams, COUNT(*) AS n_distinct_b
      FROM bg GROUP BY 1
    ), j AS (
      -- start from every doc: empty docs (no tokens) still get a row
      -- with n_words=0, fracs 0.0, keep=true — mirrors the operator
      SELECT t.doc_id, COALESCE(ws.n_words, 0) AS n_words,
             ws.top_cnt, ws.n_distinct, bs.n_bigrams, bs.n_distinct_b,
             CASE WHEN COALESCE(ws.n_words, 0) = 0 THEN 0.0
                  ELSE 1.0 - 1.0 * ws.n_distinct / ws.n_words END AS dw,
             CASE WHEN COALESCE(ws.n_words, 0) = 0 THEN 0.0
                  ELSE 1.0 * ws.top_cnt / ws.n_words END AS tw,
             CASE WHEN bs.n_bigrams IS NULL OR bs.n_bigrams = 0 THEN 0.0
                  ELSE 1.0 - 1.0 * bs.n_distinct_b / bs.n_bigrams END AS db
      FROM t LEFT JOIN ws ON t.doc_id = ws.doc_id
             LEFT JOIN bs ON t.doc_id = bs.doc_id
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           round(dw, 6) AS dup_word_frac,
           round(tw, 6) AS top_word_frac,
           round(db, 6) AS dup_bigram_frac,
           (dw <= 0.55 AND tw <= 0.10 AND db <= 0.05) AS keep
    FROM j
    """,
)
def curation_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals + keep verdict (dup-word,
    top-word, dup-bigram fractions). Scale shape: explode → two
    hash aggregations sharing the doc-keyed shuffle — see
    operators/curation.py:repetition_stats."""
    from datasette_upload_csvs_spark.operators.curation import repetition_stats

    return repetition_stats(load(spark, sf_dir, "documents"))


@q(
    "curation_strip_boilerplate",
    f"""
    WITH t AS (
      SELECT doc_id, list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                 x -> x <> '') AS tok
      FROM documents
    ), nd AS (SELECT COUNT(*) AS n_docs FROM t),
    dfc AS (
      SELECT tok2, COUNT(*) AS df
      FROM (SELECT doc_id, unnest(list_distinct(tok)) AS tok2 FROM t)
      GROUP BY 1
    ), stop AS (
      SELECT coalesce(list(tok2 ORDER BY tok2), []) AS s
      FROM dfc, nd WHERE df > n_docs * 0.78
    )
    SELECT doc_id,
           CAST(len(tok) AS INTEGER) AS n_tokens_before,
           CAST(len(kept) AS INTEGER) AS n_tokens_after,
           md5(coalesce(array_to_string(kept, ' '), '')) AS clean_hash
    FROM (SELECT doc_id, tok,
                 list_filter(tok, x -> NOT list_contains(s, x)) AS kept
          FROM t, stop)
    """,
)
def curation_strip_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-document-frequency token strip (CCNet-style boilerplate
    cut). The stop set is provably tiny (≤ 1/max_df_frac tokens per
    df mass), broadcast once; docs filter their token arrays in
    codegen with order preserved — no explode/re-sort round trip."""
    from datasette_upload_csvs_spark.operators.curation import strip_boilerplate

    return strip_boilerplate(load(spark, sf_dir, "documents"))


@q(
    "curation_pack_chunks",
    f"""
    WITH t AS (
      SELECT doc_id,
             greatest(len(list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                      x -> x <> '')), 1) AS n
      FROM documents
    ), c AS (
      SELECT doc_id, n,
             COALESCE(SUM(n) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
      FROM t
    )
    SELECT doc_id, CAST(n AS INTEGER) AS n_tokens,
           CAST(st AS BIGINT) AS start_offset,
           CAST(floor(st / 512) AS BIGINT) AS first_chunk,
           CAST(floor((st + n - 1) / 512) AS BIGINT) AS last_chunk
    FROM c
    """,
)
def curation_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (every pretraining loader's
    layout): docs laid end-to-end in id order, cut every 512 tokens.
    The oracle's global running sum is a single-partition window; the
    Spark plan is the DISTRIBUTED two-phase prefix sum — per-bucket
    totals prefix-summed and broadcast, within-bucket windows in
    parallel — see operators/curation.py:pack_concat_chunks."""
    from datasette_upload_csvs_spark.operators.curation import pack_concat_chunks

    return pack_concat_chunks(
        load(spark, sf_dir, "documents"), chunk_tokens=512, bucket_size=1000
    ).withColumn("n_tokens", F.col("n_tokens").cast("int"))


@q(
    "curation_pii_redact",
    f"""
    WITH p AS (
      SELECT doc_id,
             text || ' contact: user' || CAST(doc_id AS VARCHAR)
                  || '@example.com +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS tp
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(tp, '{_EMAIL_RE_SQL}')) AS INTEGER)
             AS n_emails,
           CAST(len(regexp_extract_all(tp, '{_PHONE_RE_SQL}')) AS INTEGER)
             AS n_phones,
           md5(regexp_replace(regexp_replace(tp, '{_EMAIL_RE_SQL}', '[EMAIL]', 'g'),
                              '{_PHONE_RE_SQL}', '[PHONE]', 'g'))
             AS redacted_hash
    FROM p
    """,
)
def curation_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII scrub with match counts. The synthetic corpus has no
    contact strings, so the query first composes a deterministic one
    per doc (user<id>@example.com, +1-555-<id%10000>) — both engines
    build the identical string, then redact it independently; the
    md5 of the redacted text is the cross-engine proof. Map-only
    codegen pass (regexp_count + regexp_replace) at any scale."""
    from datasette_upload_csvs_spark.operators.curation import redact_pii

    d = load(spark, sf_dir, "documents").withColumn(
        "text_pii",
        F.concat(
            F.col("text"),
            F.lit(" contact: user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com +1-555-"),
            F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
        ),
    )
    return redact_pii(d, "text_pii")


@q(
    "curation_mixture_rebalance",
    """
    WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
    m AS (SELECT MIN(n_docs) AS min_n FROM c),
    r AS (SELECT source, n_docs, CAST(min_n AS DOUBLE) / n_docs AS rate
          FROM c, m)
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN CAST(md5_number_lower(CAST(doc_id AS VARCHAR))
                               AS DOUBLE) / 18446744073709551616.0 < rate
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents JOIN r USING (source)
    GROUP BY source, n_docs
    """,
)
def curation_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample every source to the smallest source's size (uniform
    training mixture). Keep decisions are md5-content-deterministic —
    stable under repartition, AQE, and incremental reruns — and the
    per-source audit (n_docs, n_kept) is what this query returns."""
    from datasette_upload_csvs_spark.operators.curation import rebalance_to_uniform

    return rebalance_to_uniform(load(spark, sf_dir, "documents"), "source")


@q(
    "curation_shuffle_order",
    """
    WITH h AS (
      SELECT doc_id,
             md5_number_lower(CAST(doc_id AS VARCHAR) || ':shuffle-v1') AS hk
      FROM documents
    )
    SELECT doc_id, CAST(hk % 8 AS INTEGER) AS shard_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY hk % 8
                                   ORDER BY hk, doc_id) AS INTEGER)
             AS pos_in_shard
    FROM h
    """,
)
def curation_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sharded training-order shuffle: shard = md5 % 8,
    position = md5 rank within shard. Shards are read independently
    (no global sort); salt bump = new epoch order. The only exchange
    is the hash partition by shard."""
    from datasette_upload_csvs_spark.operators.curation import shuffle_shards

    return shuffle_shards(load(spark, sf_dir, "documents"), num_shards=8)


@q(
    "similarity_pq_recall",
    "SELECT CAST(0 AS BIGINT) AS query_id, TRUE AS recall_ok",
)
def similarity_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC (Jégou et al.) vs exact L2 top-10:
    16 subspaces × 64 codes (96 bits/vector, ~170× smaller than the
    raw float64s) must recover ≥ 30% — the same bar as the LSH gate.
    Codebooks are seeded-sample k-means; k-means init isn't bit-
    stable across environments, so the oracle pins the verdict, not
    the neighbor set (the ivf_recall convention). Scoring never
    touches the float vectors: an m×n_codes literal lookup table in
    codegen over the int code columns."""
    emb = load(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id", similarity.as_double_array(F.col("embedding")).alias("v")
    )
    qv = v.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    exact = (
        v.crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != 0)
        .withColumn(
            "d",
            F.aggregate(
                F.zip_with("v", "qv", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        .orderBy(F.col("d").asc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id")
    )
    approx = similarity.pq_topk(emb, 0, 10, m=16, n_codes=64).select(
        F.col("neighbor_id").alias("vec_id")
    )
    hit = exact.join(approx, "vec_id", "left_semi").count()
    return spark.createDataFrame(
        [(0, hit >= 3)], "query_id long, recall_ok boolean"
    )


@q(
    "dedup_ngram_coverage",
    f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                 x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS g
      FROM toks, UNNEST(range(1, greatest(len(t) - 6, 2))) AS u(i)
    ), dfg AS (
      SELECT g, COUNT(*) AS df FROM sh GROUP BY g
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_grams,
           round(1.0 * SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) / COUNT(*), 6)
             AS coverage
    FROM sh JOIN dfg USING (g)
    GROUP BY doc_id
    """,
)
def dedup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-flavored duplication metric (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better"): the
    fraction of a doc's distinct 8-gram shingles that occur in more
    than one document. Unlike pairwise dedup this is linear: explode
    the inverted index once, count gram document-frequency, join
    back — no candidate pairs. Docs shorter than 8 tokens contribute
    their whole text as one shingle (same convention as
    functions/text.py:shingles; grams are hashed windows over a
    materialized token array — _hashed_gram_rows)."""
    d = load(spark, sf_dir, "documents")
    sh = _hashed_gram_rows(d, 8, ["doc_id"])
    dfg = sh.groupBy("g").agg(F.count("*").alias("df"))
    dup = F.sum((F.col("df") >= 2).cast("bigint"))
    return (
        sh.join(dfg, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            dup.alias("dup_grams"),
            F.round(dup / F.count("*"), 6).alias("coverage"),
        )
    )


@q(
    "export_balanced_shards",
    f"""
    WITH t AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(text, '{SPLIT_RE}'),
                             x -> x <> '')) AS n
      FROM documents
    ), r AS (
      SELECT doc_id, n,
             ROW_NUMBER() OVER (
               ORDER BY n DESC,
                        md5_number_lower(CAST(doc_id AS VARCHAR)) % 32,
                        doc_id
             ) AS rk
      FROM t
    )
    SELECT CAST((rk - 1) % 16 AS INTEGER) AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS total_tokens
    FROM r GROUP BY 1
    """,
)
def export_balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-balanced training shards: docs ranked by (token count
    desc, md5 salt, id) and dealt round-robin, so every shard carries
    equal token WORK, not just equal doc counts. The oracle's global
    ROW_NUMBER is the spec; the Spark plan computes the identical
    rank with the two-phase (size, salt)-band prefix pattern — no
    full-data single-partition window, and a hot size band (every doc
    truncated to the same length) fans out across 32 salt tasks
    instead of serializing — operators/export.py:balanced_shards."""
    from datasette_upload_csvs_spark.functions.text import token_count
    from datasette_upload_csvs_spark.operators.export import balanced_shards

    d = load(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n")
    )
    return (
        balanced_shards(d, "n", num_shards=16)
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").alias("total_tokens"),
        )
    )


@q(
    "text_unigram_logprob",
    f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                x -> x <> '')) AS w
      FROM documents
    ), freq AS (
      SELECT w, COUNT(*) AS cnt FROM toks GROUP BY w
    ), tot AS (SELECT SUM(cnt) AS tot FROM freq),
    scored AS (
      SELECT w, CAST(round(-ln(cnt / tot), 10) AS DECIMAL(28,12)) AS nll
      FROM freq, tot
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           round(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS avg_nll
    FROM toks JOIN scored USING (w)
    GROUP BY doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc average negative log-prob under the corpus unigram
    model — the cheap KenLM-perplexity stand-in for quality scoring.
    Portability uses the entropy recipe: exact int→double division,
    per-term round(10) before a decimal sum (accumulation order
    can't matter). operators/textstats.py:unigram_logprob."""
    from datasette_upload_csvs_spark.operators.textstats import unigram_logprob

    return unigram_logprob(load(spark, sf_dir, "documents"))


@q(
    "udtf_chunk_text",
    f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                 x -> x <> '') AS t
      FROM documents
    )
    SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
           CAST(len(t[i*64+1 : i*64+64]) AS INTEGER) AS n_tokens,
           md5(array_to_string(t[i*64+1 : i*64+64], ' ')) AS chunk_hash
    FROM toks, UNNEST(range(0, CAST(ceil(len(t) / 64.0) AS BIGINT))) AS u(i)
    """,
)
def udtf_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real Python UDTF (PySpark 4 `@udtf`, lateral-joined in SQL):
    split each document into 64-token chunks, one output row per
    chunk with a content hash the oracle reproduces via list slicing.

    This demonstrates the table-function API surface itself — for
    THIS particular job the pure-Catalyst equivalent (posexplode over
    a sliced-array transform, cf. curation_pack_chunks) is the faster
    plan, and the docstring says so; a UDTF earns its Python row path
    when the per-row expansion is genuinely imperative (parsers,
    tokenizers, decoders). Arrow-batched via useArrow."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, n_tokens int, chunk_hash string",
          useArrow=True)
    class ChunkText:
        def eval(self, text: str):
            import hashlib
            import re as _re

            toks = [t for t in _re.split(r"\s+", text or "") if t]
            n = len(toks)
            chunks = max((n + 63) // 64, 1) if n else 0
            for i in range(chunks):
                piece = toks[i * 64 : (i + 1) * 64]
                yield (
                    i,
                    len(piece),
                    hashlib.md5(" ".join(piece).encode()).hexdigest(),
                )

    spark.udtf.register("chunk_text_udtf", ChunkText)
    load(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.n_tokens, c.chunk_hash
        FROM _udtf_docs d, LATERAL chunk_text_udtf(d.text) c
        """
    )


@q(
    "ks_price_returnflag_binned",
    """
    WITH src AS (
      SELECT l_returnflag AS flag,
             least(CAST(floor(l_extendedprice / 1000.0) AS BIGINT), 99)
               AS bin
      FROM lineitem WHERE l_returnflag IN ('A', 'R')
    ), counts AS (
      SELECT bin,
             SUM(CASE WHEN flag = 'A' THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN flag = 'R' THEN 1 ELSE 0 END) AS cr
      FROM src GROUP BY bin
    ), tot AS (
      SELECT SUM(ca) AS na, SUM(cr) AS nr FROM counts
    ), cdf AS (
      SELECT bin,
             SUM(ca) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum_a,
             SUM(cr) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum_r
      FROM counts
    )
    SELECT round(MAX(abs(1.0 * cum_a / na - 1.0 * cum_r / nr)), 6)
             AS ks_stat,
           CAST(MAX(na) AS BIGINT) AS n_a,
           CAST(MAX(nr) AS BIGINT) AS n_r
    FROM cdf, tot
    """,
)
def ks_price_returnflag_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the price
    distributions of A- vs R-flag lineitems, over 100 equi-width
    $1000 bins. Exact KS needs a global sort of the pooled sample —
    a single-partition window at any serious scale — so the engine
    ships the BINNED statistic: per-bin counts (one map-side-combined
    aggregate), CDFs via a window over 100 bin rows, D = max |ΔCDF|.
    Binning bounds the error by the bin's probability mass and keeps
    the plan scale-free; cum fractions are exact-integer ratios so
    both engines agree bit-for-bit."""
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
    )
    binned = l.select(
        F.col("l_returnflag").alias("flag"),
        F.least(
            F.floor(F.col("l_extendedprice") / 1000.0).cast("bigint"),
            F.lit(99),
        ).alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum((F.col("flag") == "A").cast("bigint")).alias("ca"),
        F.sum((F.col("flag") == "R").cast("bigint")).alias("cr"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    tot = counts.agg(
        F.sum("ca").alias("na"), F.sum("cr").alias("nr")
    )
    cdf = counts.select(
        "bin",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cr").over(w).alias("cum_r"),
    )
    return (
        cdf.crossJoin(F.broadcast(tot))
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("cum_a") / F.col("na")
                        - F.col("cum_r") / F.col("nr")
                    )
                ),
                6,
            ).alias("ks_stat"),
            F.max("na").alias("n_a"),
            F.max("nr").alias("n_r"),
        )
    )


@q(
    "mutual_info_priority_flag",
    """
    WITH joint AS (
      SELECT o_orderpriority AS p, l_returnflag AS f, COUNT(*) AS c
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1, 2
    ), tot AS (SELECT SUM(c) AS n FROM joint),
    marg_p AS (SELECT p, SUM(c) AS cp FROM joint GROUP BY p),
    marg_f AS (SELECT f, SUM(c) AS cf FROM joint GROUP BY f)
    SELECT round(CAST(SUM(CAST(round(
             (1.0 * c / n) * ln((1.0 * c * n) / (1.0 * cp * cf)), 10)
             AS DECIMAL(28,12))) AS DOUBLE), 6) AS mutual_info_nats,
           CAST(COUNT(*) AS BIGINT) AS n_cells
    FROM joint JOIN marg_p USING (p) JOIN marg_f USING (f)
         CROSS JOIN tot
    """,
)
def mutual_info_priority_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(order priority; return flag) in nats —
    the dependence screen feature stores run between categorical
    columns (chi-square's information-theoretic sibling). One joint
    aggregate; marginals re-aggregate the (tiny) contingency table;
    per-cell p·ln terms round(10) before a decimal sum, the entropy
    portability recipe. The only data-scale shuffle is the joint
    (p, f) count — map-side combined on 15 cells."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    joint = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_orderpriority").alias("p"),
            F.col("l_returnflag").alias("f"),
        )
        .agg(F.count("*").alias("c"))
        # consumed by both marginals and the final join: persist the
        # 15-row contingency table or the fact join runs three times
        .persist()
    )
    tot = joint.agg(F.sum("c").alias("n"))
    mp = joint.groupBy("p").agg(F.sum("c").alias("cp"))
    mf = joint.groupBy("f").agg(F.sum("c").alias("cf"))
    term = F.round(
        (F.col("c") / F.col("n"))
        * F.log((F.col("c") * F.col("n")) / (F.col("cp") * F.col("cf"))),
        10,
    ).cast("decimal(28,12)")
    return (
        joint.join(F.broadcast(mp), "p")
        .join(F.broadcast(mf), "f")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.round(F.sum(term).cast("double"), 6).alias("mutual_info_nats"),
            F.count("*").alias("n_cells"),
        )
    )


@q(
    "cms_token_heavy_hitters",
    f"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                x -> x <> '')) AS w
      FROM documents
    ), cms AS (
      SELECT r, CAST(md5_number_lower(w || ':' || CAST(r AS VARCHAR)) % 1024
                     AS INTEGER) AS col,
             COUNT(*) AS c
      FROM toks, UNNEST([0, 1, 2, 3]) AS u(r)
      GROUP BY 1, 2
    ), truth AS (
      SELECT w, COUNT(*) AS true_cnt FROM toks GROUP BY w
      ORDER BY true_cnt DESC, w LIMIT 10
    ), est AS (
      SELECT t.w, t.true_cnt, MIN(cms.c) AS est_cnt
      FROM truth t,
           UNNEST([0, 1, 2, 3]) AS u(r)
           JOIN cms ON cms.r = u.r
            AND cms.col = CAST(md5_number_lower(t.w || ':' ||
                                CAST(u.r AS VARCHAR)) % 1024 AS INTEGER)
      GROUP BY t.w, t.true_cnt
    )
    SELECT w, CAST(true_cnt AS BIGINT) AS true_cnt,
           CAST(est_cnt AS BIGINT) AS est_cnt,
           est_cnt >= true_cnt AS bound_holds
    FROM est
    """,
)
def cms_token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode/Muthukrishnan) over the token
    stream: 4 rows × 1024 columns of counters built in ONE hash
    aggregation — the mergeable frequency sketch that replaces exact
    counts when the key space doesn't fit (HLL counts distincts,
    quantile sketches rank; CMS answers "how often did X occur").
    Estimates for the true top-10 tokens are min-over-rows lookups;
    the CMS one-sided guarantee (estimate ≥ truth) is emitted as a
    checked column. Hashes are md5-low-64 mod width, so the oracle
    builds the identical sketch. At 100 TB the sketch is 4 KB of
    counters per executor, merged by the same groupBy."""
    toks = load(spark, sf_dir, "documents").select(
        F.explode(_text_tokens("text")).alias("w")
    )
    rows_ = F.array(*[F.lit(i) for i in range(4)])
    # Pre-aggregate to VOCAB counts before any hashing: the counter
    # for (r, col) is Σ counts of the tokens mapping there, so
    # building the sketch from (w, cnt) is value-identical to
    # counting the raw stream — but the 4 md5 hashes per key run
    # over |vocab| rows instead of |token occurrences| (three orders
    # of magnitude at corpus scale), and the corpus is tokenized
    # ONCE for both the sketch and the truth branch (the vocab
    # aggregate persists; it is vocabulary-sized).
    vocab = toks.groupBy("w").agg(F.count("*").alias("true_cnt")).persist()
    keyed = vocab.select(
        "w", "true_cnt", F.explode(rows_).alias("r")
    ).withColumn(
        "col",
        F.pmod(
            _md5_low64(F.concat(F.col("w"), F.lit(":"), F.col("r").cast("string"))),
            F.lit(1024),
        ).cast("int"),
    )
    cms = keyed.groupBy("r", "col").agg(F.sum("true_cnt").alias("c"))
    truth = vocab.orderBy(F.desc("true_cnt"), "w").limit(10)
    probes = truth.select(
        "w", "true_cnt", F.explode(rows_).alias("r")
    ).withColumn(
        "col",
        F.pmod(
            _md5_low64(F.concat(F.col("w"), F.lit(":"), F.col("r").cast("string"))),
            F.lit(1024),
        ).cast("int"),
    )
    est = (
        probes.join(cms, ["r", "col"])
        .groupBy("w", "true_cnt")
        .agg(F.min("c").alias("est_cnt"))
    )
    return est.select(
        "w",
        "true_cnt",
        "est_cnt",
        (F.col("est_cnt") >= F.col("true_cnt")).alias("bound_holds"),
    )


@q(
    "bloom_contamination_screen",
    f"""
    WITH fp AS (
      SELECT doc_id, source,
             md5(array_to_string(list_sort(list_distinct(
               list_filter(string_split_regex(lower(text), '{SPLIT_RE}'),
                           x -> x <> ''))), ' ')) AS f
      FROM documents
    ), test_pos AS (
      SELECT DISTINCT CAST(md5_number_lower(f || ':' || CAST(k AS VARCHAR))
                           % 1048576 AS BIGINT) AS pos
      FROM fp, UNNEST([0, 1, 2, 3]) AS u(k)
      WHERE doc_id % 10 = 0
    ), bits AS (SELECT list(pos ORDER BY pos) AS bs FROM test_pos),
    train AS (
      SELECT source, f FROM fp WHERE doc_id % 10 <> 0
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_flagged
    FROM train, bits
    WHERE list_contains(bs, CAST(md5_number_lower(f || ':0') % 1048576 AS BIGINT))
      AND list_contains(bs, CAST(md5_number_lower(f || ':1') % 1048576 AS BIGINT))
      AND list_contains(bs, CAST(md5_number_lower(f || ':2') % 1048576 AS BIGINT))
      AND list_contains(bs, CAST(md5_number_lower(f || ':3') % 1048576 AS BIGINT))
    GROUP BY source
    """,
)
def bloom_contamination_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination screen: the held-out set's
    fingerprints hash into k=4 positions of a 2^20-bit filter; a
    train doc is flagged when ALL its positions are set (a superset
    of true contamination — Bloom's no-false-negative guarantee is
    what an exclusion screen needs). contamination_overlap is the
    exact semi-join twin; the Bloom variant is what ships when the
    test set is too large to broadcast as raw fingerprints — the
    filter is ~128 KB regardless of test-set size. The position SET
    here is a sorted array standing in for the packed bitset (the
    membership algebra is identical and oracle-reproducible);
    array_contains over a broadcast sorted array is a codegen'd
    probe."""
    fp = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5(
            F.concat_ws(
                " ",
                F.sort_array(
                    F.array_distinct(_text_tokens(F.lower(F.col("text"))))
                ),
            )
        ).alias("f"),
    )
    ks = F.array(*[F.lit(i) for i in range(4)])
    test_pos = (
        fp.filter(F.pmod("doc_id", F.lit(10)) == 0)
        .select(F.explode(ks).alias("k"), "f")
        .select(
            F.pmod(
                _md5_low64(
                    F.concat(F.col("f"), F.lit(":"), F.col("k").cast("string"))
                ),
                F.lit(1_048_576),
            )
            .cast("bigint")
            .alias("pos")
        )
        .distinct()
        .agg(F.sort_array(F.collect_list("pos")).alias("bs"))
    )
    train = fp.filter(F.pmod("doc_id", F.lit(10)) != 0)
    cond = None
    for k in range(4):
        p = F.pmod(
            _md5_low64(F.concat(F.col("f"), F.lit(f":{k}"))),
            F.lit(1_048_576),
        ).cast("bigint")
        c = F.array_contains(F.col("bs"), p)
        cond = c if cond is None else cond & c
    return (
        train.crossJoin(F.broadcast(test_pos))
        .filter(cond)
        .groupBy("source")
        .agg(F.count("*").alias("n_flagged"))
    )


@q(
    "text_bigram_logprob",
    f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                 x -> x <> '') AS t
      FROM documents
    ), bg AS (
      SELECT doc_id, t[i] AS w1, t[i+1] AS w2
      FROM toks, UNNEST(range(1, len(t))) AS u(i)
    ), cbg AS (
      SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2
    ), cctx AS (
      SELECT w1, SUM(c12) AS c1 FROM cbg GROUP BY 1
    ), scored AS (
      SELECT w1, w2,
             CAST(round(-ln(1.0 * c12 / c1), 10) AS DECIMAL(28,12)) AS nll
      FROM cbg JOIN cctx USING (w1)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           round(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS avg_nll
    FROM bg JOIN scored USING (w1, w2)
    GROUP BY doc_id
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc average negative log-prob under the corpus BIGRAM
    model, P(w2|w1) = c(w1,w2)/c(w1) — one order sharper than
    text_unigram_logprob at separating template spam (repeated
    transitions are cheap) from fresh prose (rare transitions are
    expensive). Docs with <2 tokens have no bigrams and drop out,
    matching the oracle's join shape. Same portability recipe:
    exact-integer division, per-term round(10), decimal sum. Plan:
    bigram explode → (w1,w2) count (map-side combined) → context
    re-agg over the (small) bigram vocab → join back on the bigram
    key."""
    t = _text_tokens(F.col("text"))
    d = load(spark, sf_dir, "documents")
    n = F.size(t)
    bg = d.select(
        "doc_id",
        F.explode(
            F.when(
                n >= 2,
                F.transform(
                    F.slice(t, 1, n - 1),
                    lambda x, i: F.struct(
                        x.alias("w1"),
                        F.element_at(t, i + F.lit(2)).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    cbg = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    cctx = cbg.groupBy("w1").agg(F.sum("c12").alias("c1"))
    scored = cbg.join(cctx, "w1").select(
        "w1",
        "w2",
        F.round(-F.log(F.col("c12") / F.col("c1")), 10)
        .cast("decimal(28,12)")
        .alias("nll"),
    )
    return (
        bg.join(scored, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.sum("nll").cast("double") / F.count("*"), 6).alias(
                "avg_nll"
            ),
        )
    )


@q(
    "hybrid_rrf_retrieval",
    f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                 x -> x <> '') AS t
      FROM documents WHERE doc_id <> 0
    ), n_docs AS (SELECT COUNT(*) AS n FROM documents),
    dfreq AS (
      SELECT tok, COUNT(*) AS df
      FROM (SELECT doc_id, unnest(list_distinct(t)) AS tok FROM toks)
      WHERE tok IN ('join', 'scan', 'merge')
      GROUP BY tok
    ), lex_scored AS (
      SELECT doc_id,
             round(SUM(len(list_filter(t, x -> x = d.tok))
                       * ln(1.0 * n.n / d.df)), 10) AS lex
      FROM toks, dfreq d, n_docs n
      GROUP BY doc_id
      HAVING SUM(len(list_filter(t, x -> x = d.tok))) > 0
    ), lex_rank AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY lex DESC, doc_id) AS r
      FROM lex_scored QUALIFY r <= 20
    ), qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
    vec_scored AS (
      SELECT vec_id AS doc_id,
             list_dot_product(embedding, q)
               / (sqrt(list_dot_product(embedding, embedding))
                  * sqrt(list_dot_product(q, q))) AS cs
      FROM embeddings, qv WHERE vec_id <> 0
    ), vec_rank AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY cs DESC, doc_id) AS r
      FROM vec_scored QUALIFY r <= 20
    ), fused AS (
      SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
             COALESCE(1.0 / (60 + l.r), 0.0)
               + COALESCE(1.0 / (60 + v.r), 0.0) AS rrf,
             l.r IS NOT NULL AS in_lex,
             v.r IS NOT NULL AS in_vec
      FROM lex_rank l FULL OUTER JOIN vec_rank v USING (doc_id)
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS INTEGER)
             AS rank,
           doc_id, round(rrf, 6) AS rrf_score, in_lex, in_vec
    FROM fused
    QUALIFY rank <= 10
    """,
)
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion (Cormack et al.):
    a lexical TF-IDF rank list (query terms join/scan/merge) and a
    vector cosine rank list (query = embedding 0) fused as
    Σ 1/(60+rank) — the standard RAG trick for marrying keyword and
    embedding recall without score calibration. Both lists carry
    deterministic tiebreaks; the fuse is a 20-row full outer join.
    At scale each list is its own top-k (TakeOrderedAndProject for
    the vector side, agg + rank for the lexical side) — fusion cost
    never grows past 2k rows."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") != 0)
    emb = load(spark, sf_dir, "embeddings")
    n_docs = load(spark, sf_dir, "documents").count()

    toks = d.select("doc_id", _text_tokens("text").alias("t"))
    terms = ["join", "scan", "merge"]
    dfreq = (
        toks.select(
            "doc_id", F.explode(F.array_distinct("t")).alias("tok")
        )
        .filter(F.col("tok").isin(terms))
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
    )
    tf = (
        toks.select("doc_id", F.explode("t").alias("tok"))
        .filter(F.col("tok").isin(terms))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    lex = (
        tf.join(F.broadcast(dfreq), "tok")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))),
                10,
            ).alias("lex")
        )
    )
    wl = Window.orderBy(F.desc("lex"), "doc_id")
    lex_rank = lex.withColumn("r", F.row_number().over(wl)).filter(
        F.col("r") <= 20
    ).select("doc_id", F.col("r").alias("lr"))

    from datasette_upload_csvs_spark.operators import similarity as _sim

    v = emb.select(
        "vec_id", _sim.as_double_array(F.col("embedding")).alias("v")
    )
    qv = v.filter(F.col("vec_id") == 0).select(F.col("v").alias("q"))
    dot = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    cs = dot(F.col("v"), F.col("q")) / (
        F.sqrt(dot(F.col("v"), F.col("v"))) * F.sqrt(dot(F.col("q"), F.col("q")))
    )
    wv = Window.orderBy(F.desc("cs"), "doc_id")
    vec_rank = (
        v.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(F.col("vec_id").alias("doc_id"), cs.alias("cs"))
        .withColumn("r", F.row_number().over(wv))
        .filter(F.col("r") <= 20)
        .select("doc_id", F.col("r").alias("vr"))
    )
    fused = (
        lex_rank.join(vec_rank, "doc_id", "full_outer")
        .select(
            "doc_id",
            (
                F.coalesce(1.0 / (F.col("lr") + 60), F.lit(0.0))
                + F.coalesce(1.0 / (F.col("vr") + 60), F.lit(0.0))
            ).alias("rrf"),
            F.col("lr").isNotNull().alias("in_lex"),
            F.col("vr").isNotNull().alias("in_vec"),
        )
    )
    wf = Window.orderBy(F.desc("rrf"), "doc_id")
    return (
        fused.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= 10)
        .select(
            "rank", "doc_id", F.round("rrf", 6).alias("rrf_score"),
            "in_lex", "in_vec",
        )
    )


@q(
    "dedup_graph_triangles",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                 x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, UNNEST(range(1, greatest(len(t) - 1, 2))) AS u(i)
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), edges AS (
      SELECT id_a, id_b
      FROM pairs JOIN sizes sa ON id_a = sa.doc_id
                 JOIN sizes sb ON id_b = sb.doc_id
      WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.7
    )
    SELECT CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(DISTINCT v) FROM
                   (SELECT id_a AS v FROM edges
                    UNION ALL SELECT id_b FROM edges)) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*)
                 FROM edges e1 JOIN edges e2 ON e1.id_b = e2.id_a
                      JOIN edges e3 ON e3.id_a = e1.id_a
                                   AND e3.id_b = e2.id_b) AS BIGINT)
             AS n_triangles
    """,
)
def dedup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the near-dup graph — the cluster-cohesion
    audit: a dedup graph whose components are triangle-dense is
    true duplicate clusters; components that are long triangle-free
    chains signal threshold-chaining (A~B~C with A≁C), where
    cluster-canonical dedup over-merges. Edges come from the SAME
    exact-Jaccard-verified MinHash pipeline the dedup queries use;
    triangles are the a<b<c ordered two-hop join — the node-iterator
    shape whose cost is bounded by Σ deg², kept sane at scale by the
    LSH graph's bounded degree (bucket caps), never by all-pairs."""
    from datasette_upload_csvs_spark.operators import dedup

    pairs = dedup.minhash_near_dup_pairs(
        load(spark, sf_dir, "documents"),
        threshold=0.7,
        exact_floor_max_df=_FLOOR_MAX_DF,
    )
    edges = pairs.select("id_a", "id_b").persist()
    n_edges = edges.count()
    n_nodes = (
        edges.select(F.col("id_a").alias("v"))
        .unionAll(edges.select(F.col("id_b").alias("v")))
        .distinct()
        .count()
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    n_tri = (
        e1.join(e2, F.col("e1.id_b") == F.col("e2.id_a"))
        .join(
            e3,
            (F.col("e3.id_a") == F.col("e1.id_a"))
            & (F.col("e3.id_b") == F.col("e2.id_b")),
        )
        .count()
    )
    # every consumer of `edges` has materialized above — release the
    # cached blocks instead of leaking them into executor storage
    edges.unpersist()
    return spark.createDataFrame(
        [(n_edges, n_nodes, n_tri)],
        "n_edges long, n_nodes long, n_triangles long",
    )


@q(
    "text_vocab_coverage",
    f"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                x -> x <> '')) AS w
      FROM documents
    ), freq AS (
      SELECT w, COUNT(*) AS c FROM toks GROUP BY w
    ), ranked AS (
      SELECT c,
             SUM(c) OVER (ORDER BY c DESC, w ROWS UNBOUNDED PRECEDING)
               AS cum,
             SUM(c) OVER () AS tot,
             ROW_NUMBER() OVER (ORDER BY c DESC, w) AS r
      FROM freq
    )
    SELECT CAST(MAX(r) AS BIGINT) AS vocab_size,
           CAST(MIN(CASE WHEN 1.0 * cum / tot >= 0.5 THEN r END) AS BIGINT)
             AS types_for_50pct,
           CAST(MIN(CASE WHEN 1.0 * cum / tot >= 0.9 THEN r END) AS BIGINT)
             AS types_for_90pct,
           CAST(MIN(CASE WHEN 1.0 * cum / tot >= 0.99 THEN r END) AS BIGINT)
             AS types_for_99pct
    FROM ranked
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve — how many types cover 50/90/99% of
    token occurrences (the Heaps/Zipf audit that sizes a tokenizer's
    vocab before training one). The window runs over the VOCABULARY
    (one row per distinct token), which is sublinear in corpus size —
    the corpus itself is reduced by one map-side-combined count
    aggregate first, so the single-partition rank window is over
    ~10⁵-10⁶ rows at any corpus scale, not over tokens."""
    freq = (
        load(spark, sf_dir, "documents")
        .select(F.explode(_text_tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    w_rank = Window.orderBy(F.desc("c"), "w")
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, 0)
    ranked = freq.select(
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("tot"),
        F.row_number().over(w_rank).alias("r"),
    )
    share = F.col("cum") / F.col("tot")
    return ranked.agg(
        F.max("r").alias("vocab_size"),
        F.min(F.when(share >= 0.5, F.col("r"))).alias("types_for_50pct"),
        F.min(F.when(share >= 0.9, F.col("r"))).alias("types_for_90pct"),
        F.min(F.when(share >= 0.99, F.col("r"))).alias("types_for_99pct"),
    )


@q(
    "pack_padding_waste",
    f"""
    WITH t AS (
      SELECT source,
             greatest(len(list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                      x -> x <> '')), 1) AS n
      FROM documents
    )
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS total_tokens,
           CAST(SUM((512 - n % 512) % 512) AS BIGINT) AS pad_tokens,
           round(1.0 * SUM((512 - n % 512) % 512)
                 / (SUM(n) + SUM((512 - n % 512) % 512)), 6) AS waste_frac
    FROM t GROUP BY source
    """,
)
def pack_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding waste of pad-to-512 batching per source — the number
    that justifies concat-and-chunk packing (curation_pack_chunks):
    every doc shorter than the context burns (512 − n mod 512) pad
    tokens, and waste_frac is the share of batch slots holding
    padding. One map-side aggregate; the decision input for choosing
    a packing strategy per source."""
    n = F.greatest(F.size(_text_tokens("text")), F.lit(1))
    pad = (F.lit(512) - n % 512) % 512
    return (
        load(spark, sf_dir, "documents")
        .select("source", n.alias("n"), pad.alias("pad"))
        .groupBy("source")
        .agg(
            F.sum("n").alias("total_tokens"),
            F.sum("pad").alias("pad_tokens"),
            F.round(
                F.sum("pad") / (F.sum("n") + F.sum("pad")), 6
            ).alias("waste_frac"),
        )
    )


@q(
    "events_anomaly_mad_daily",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             COUNT(*) AS c
      FROM events GROUP BY 1
    ), med AS (
      SELECT quantile_cont(c, 0.5) AS m FROM daily
    ), mad AS (
      SELECT quantile_cont(abs(c - med.m), 0.5) AS v, MAX(med.m) AS m
      FROM daily, med GROUP BY med.m
    )
    SELECT d, CAST(c AS BIGINT) AS n_events,
           round((c - mad.m) / greatest(mad.v * 1.4826, 1e-9), 4)
             AS robust_z,
           abs(c - mad.m) > 3.5 * mad.v * 1.4826 AS is_anomaly
    FROM daily, mad
    ORDER BY d
    """,
)
def events_anomaly_mad_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-volume anomaly flags via median + MAD (the
    outlier-immune z-score: a traffic spike can't inflate its own
    detection threshold the way mean/stddev lets it). Per-day counts
    are one aggregate; median/MAD run over the (tiny) daily series;
    flags are a broadcast cross join back. The robust-σ factor
    1.4826 makes the threshold comparable to a 3.5σ rule."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.count("*").alias("c"))
    med = daily.agg(F.expr("percentile(c, 0.5)").alias("m"))
    mad = (
        daily.crossJoin(F.broadcast(med))
        .groupBy("m")
        .agg(F.expr("percentile(abs(c - m), 0.5)").alias("v"))
    )
    sig = F.greatest(F.col("v") * 1.4826, F.lit(1e-9))
    return (
        daily.crossJoin(F.broadcast(mad))
        .select(
            "d",
            F.col("c").alias("n_events"),
            F.round((F.col("c") - F.col("m")) / sig, 4).alias("robust_z"),
            (F.abs(F.col("c") - F.col("m")) > 3.5 * F.col("v") * 1.4826).alias(
                "is_anomaly"
            ),
        )
        .orderBy("d")
    )


@q(
    "dedup_rate_by_source",
    """
    WITH """ + _EDGE_CTES_BODY + """, dup_docs AS (
      SELECT DISTINCT v FROM
        (SELECT id_a AS v FROM good UNION ALL SELECT id_b FROM good)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_in_dup_pair,
           round(1.0 * SUM(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END)
                 / COUNT(*), 6) AS dup_rate
    FROM documents LEFT JOIN dup_docs ON doc_id = v
    GROUP BY source
    """,
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplication rate per source — the redundancy audit that
    feeds mixture decisions (a source whose docs mostly near-dup each
    other contributes less unique signal than its row count claims).
    Documents in ≥1 verified near-dup pair, as a fraction of the
    source; edges come from the exact-Jaccard-verified MinHash
    pipeline, membership is a broadcast semi-style left join.
    pair_mode="star": this audit only reads the duplicated VERTEX
    set, which the star edge set preserves exactly (every member of
    a dup group touches a star edge; every doc in a verified pair
    touches a rep edge — see dedup.minhash_near_dup_pairs), with
    output linear in dup mass."""
    from datasette_upload_csvs_spark.operators import dedup

    d = load(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_dup_pairs(
        d, threshold=0.7, exact_floor_max_df=_FLOOR_MAX_DF,
        pair_mode="star",
    )
    dupd = (
        pairs.select(F.col("id_a").alias("v"))
        .unionAll(pairs.select(F.col("id_b").alias("v")))
        .distinct()
    )
    return (
        d.join(F.broadcast(dupd), d.doc_id == dupd.v, "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("v").isNotNull().cast("bigint")).alias(
                "n_in_dup_pair"
            ),
            F.round(
                F.sum(F.col("v").isNotNull().cast("bigint")) / F.count("*"),
                6,
            ).alias("dup_rate"),
        )
    )


@q(
    "split_cluster_safe",
    _CLUSTER_CTES.rstrip()
    + """, assigned AS (
      SELECT d.doc_id,
             COALESCE(c.component, d.doc_id) AS g,
             CASE WHEN substr(md5(CAST(COALESCE(c.component, d.doc_id)
                                       AS VARCHAR)), 1, 1)
                       IN ('0', '1', '2') THEN 'val' ELSE 'train' END AS split
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.v
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT g) AS BIGINT) AS n_clusters
    FROM assigned GROUP BY split
    """,
)
def split_cluster_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val split: the split key is the near-dup
    CLUSTER id, not the doc id, so two near-duplicate documents can
    never land on opposite sides of the split (the eval-contamination
    mode a doc-keyed hash split silently permits). Clusters come from
    the same connected components dedup_groups verifies — edges from
    the MinHash+LSH banded pipeline (exact-verified, sub-quadratic,
    immune to hot-shingle O(df²) buckets), so the full-corpus split
    run is the 100 TB-shaped job; membership is md5(cluster) —
    deterministic, engine-portable. Output audits docs and clusters
    per split. pair_mode="star": CC consumes a connectivity-
    equivalent edge set, linear in dup mass (see dedup_groups)."""
    from datasette_upload_csvs_spark.operators import graph

    docs = load(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_dup_pairs(
        docs, threshold=0.7, exact_floor_max_df=_FLOOR_MAX_DF,
        pair_mode="star",
    ).select(
        "id_a", "id_b"
    )
    cc = graph.connected_components(pairs)
    g = F.coalesce("component", "doc_id")
    split = F.when(
        F.substring(F.md5(g.cast("string")), 1, 1).isin("0", "1", "2"),
        "val",
    ).otherwise("train")
    return (
        docs.select("doc_id")
        .join(cc, F.col("doc_id") == F.col("vertex"), "left")
        .select(F.col("doc_id"), g.alias("g"), split.alias("split"))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("g").alias("n_clusters"),
        )
    )


@q(
    "split_incremental_stable",
    """
    WITH RECURSIVE old_docs AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 250
    ), toks1 AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                 x -> x <> '') AS t
      FROM old_docs
    ), sh1 AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks1, UNNEST(range(1, greatest(len(t) - 1, 2))) AS u(i)
    ), dfreq1 AS (
      SELECT shingle, COUNT(*) AS df FROM sh1 GROUP BY shingle
    ), rare1 AS (
      SELECT s.doc_id, s.shingle
      FROM sh1 s JOIN dfreq1 d ON s.shingle = d.shingle WHERE d.df <= 20
    ), cand1 AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM rare1 a JOIN rare1 b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ), sizes1 AS (
      SELECT doc_id, COUNT(*) AS n FROM sh1 GROUP BY doc_id
    ), pr1 AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS shared
      FROM cand1 c JOIN sh1 a ON a.doc_id = c.id_a
                   JOIN sh1 b ON b.doc_id = c.id_b AND a.shingle = b.shingle
      GROUP BY 1, 2
    ), good1 AS (
      SELECT id_a, id_b
      FROM pr1 JOIN sizes1 sa ON id_a = sa.doc_id
               JOIN sizes1 sb ON id_b = sb.doc_id
      WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.7
    ), edges1 AS (
      SELECT id_a AS v, id_b AS n FROM good1
      UNION SELECT id_b, id_a FROM good1
    ), walk1(v, c) AS (
      SELECT v, v FROM (SELECT DISTINCT v FROM edges1) t
      UNION SELECT e.v, w.c FROM edges1 e JOIN walk1 w ON w.v = e.n
    ), comp1 AS (
      SELECT v, MIN(c) AS component FROM walk1 GROUP BY v
    ), assigned1 AS (
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster_id
      FROM old_docs d LEFT JOIN comp1 c ON d.doc_id = c.v
    ), toks2 AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                 x -> x <> '') AS t
      FROM documents
    ), sh2 AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks2, UNNEST(range(1, greatest(len(t) - 1, 2))) AS u(i)
    ), dfreq2 AS (
      SELECT shingle, COUNT(*) AS df FROM sh2 GROUP BY shingle
    ), rare2 AS (
      SELECT s.doc_id, s.shingle
      FROM sh2 s JOIN dfreq2 d ON s.shingle = d.shingle WHERE d.df <= 20
    ), new_ids AS (
      SELECT doc_id FROM documents WHERE doc_id >= 250
    ), rare_new AS (
      SELECT r.doc_id, r.shingle
      FROM rare2 r JOIN new_ids n ON r.doc_id = n.doc_id
    ), cand2 AS (
      SELECT DISTINCT least(a.doc_id, b.doc_id) AS id_a,
                      greatest(a.doc_id, b.doc_id) AS id_b
      FROM rare_new a JOIN rare2 b
        ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
    ), sizes2 AS (
      SELECT doc_id, COUNT(*) AS n FROM sh2 GROUP BY doc_id
    ), pr2 AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS shared
      FROM cand2 c JOIN sh2 a ON a.doc_id = c.id_a
                   JOIN sh2 b ON b.doc_id = c.id_b AND a.shingle = b.shingle
      GROUP BY 1, 2
    ), good2 AS (
      SELECT id_a, id_b
      FROM pr2 JOIN sizes2 sa ON id_a = sa.doc_id
               JOIN sizes2 sb ON id_b = sb.doc_id
      WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.7
    ), edges2 AS (
      SELECT id_a AS v, id_b AS n FROM good2
      UNION SELECT id_b, id_a FROM good2
    ), walk2(v, c) AS (
      SELECT v, v FROM (SELECT DISTINCT v FROM edges2) t
      UNION SELECT e.v, w.c FROM edges2 e JOIN walk2 w ON w.v = e.n
    ), comp2 AS (
      SELECT v, MIN(c) AS component FROM walk2 GROUP BY v
    ), anchors AS (
      SELECT c.component, MIN(a.cluster_id) AS anchor_cluster,
             COUNT(DISTINCT a.cluster_id) AS n_anchor
      FROM comp2 c JOIN assigned1 a ON c.v = a.doc_id GROUP BY 1
    ), new_rows AS (
      SELECT n.doc_id,
             COALESCE(an.anchor_cluster, c.component, n.doc_id) AS cluster_id,
             COALESCE(an.n_anchor, 0) >= 2 AS bridged
      FROM new_ids n LEFT JOIN comp2 c ON n.doc_id = c.v
           LEFT JOIN anchors an ON c.component = an.component
    ), final AS (
      SELECT doc_id, cluster_id, FALSE AS bridged FROM assigned1
      UNION ALL
      SELECT doc_id, cluster_id, bridged FROM new_rows
    )
    SELECT CASE WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 1)
                     IN ('0', '1', '2') THEN 'val' ELSE 'train' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
           CAST(SUM(CASE WHEN bridged THEN 1 ELSE 0 END) AS BIGINT) AS n_bridged
    FROM final GROUP BY 1
    """,
)
def split_incremental_stable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-stable variant of split_cluster_safe
    (operators/splits.py): docs < 250 are assigned first (batch 1),
    then the full corpus is appended. Batch-1 labels are FROZEN —
    append_splits returns them unchanged by construction, so no
    existing document can migrate train↔val when the corpus grows
    (tests/test_splits.py proves the bridge-doc hazard). New docs
    adopt the split of the smallest linked old cluster (bridged docs
    flagged) or an md5-keyed fresh cluster. Incremental edge
    generation only probes pairs touching a new doc — per-batch work,
    not per-corpus. Oracle replays both phases in recursive SQL."""
    from datasette_upload_csvs_spark.operators import splits as splits_ops

    docs = load(spark, sf_dir, "documents")
    prev = splits_ops.assign_splits(
        docs.filter(F.col("doc_id") < 250), max_df=_CLUSTER_MAX_DF
    )
    out = splits_ops.append_splits(prev, docs, max_df=_CLUSTER_MAX_DF)
    return out.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("cluster_id").alias("n_clusters"),
        F.sum(F.col("bridged").cast("bigint")).alias("n_bridged"),
    )


# ====================================================================
# B37/B39 extensions (round 5, late): published-method curation ops —
# exact n-gram decontamination (GPT-3/Gopher recipe), SemDeDup-style
# semantic pruning (Abbas et al. '23), DSIR importance weights
# (Xie et al. '23). Each is the Spark-shaped version of the method a
# real 100 TB pretraining pipeline runs, with a DuckDB oracle twin.
# ====================================================================


@q(
    "decontaminate_exact_ngram",
    f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                 x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS g
      FROM toks, UNNEST(range(1, greatest(len(t) - 6, 2))) AS u(i)
    ), bench AS (
      SELECT DISTINCT g FROM sh WHERE doc_id % 10 = 0
    )
    SELECT s.doc_id, d.source, CAST(COUNT(*) AS BIGINT) AS n_overlap_grams
    FROM sh s JOIN bench USING (g)
              JOIN documents d ON d.doc_id = s.doc_id
    WHERE s.doc_id % 10 <> 0
    GROUP BY 1, 2
    """,
)
def decontaminate_exact_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination by exact 8-gram overlap — the
    published GPT-3/Gopher recipe (13-gram there; 8 here to suit the
    short synthetic docs): a train document is contaminated when it
    shares ANY n-gram with the held-out benchmark set (doc_id%10=0
    stands in for the benchmark, as in contamination_overlap).
    Returns one row per contaminated doc with its overlap count —
    the removal list plus the evidence an audit wants.

    Scale shape: benchmark n-gram sets are tiny relative to a 100 TB
    corpus (benchmarks are MBs), so the distinct benchmark grams
    BROADCAST and the train side stays map-only until the single
    per-doc count shuffle. No shuffle touches the corpus-sized gram
    relation, and the gram STRING is never materialized: grams are
    64-bit multi-arg xxhash64 windows over a token array
    MATERIALIZED once per row behind a 1:1 explode(array(...))
    generator (CollapseProject would otherwise inline the tokenizer
    split into every window slot, re-tokenizing 8× per window — the
    hash never crosses engines, the oracle only has to agree on gram
    equality; measured 9.8 s → 0.7 s at sf0.1).
    Compare bloom_contamination_screen (whole-doc fingerprints
    through a constant-size filter, superset semantics); this is the
    sharper n-gram-level exact screen."""
    d = load(spark, sf_dir, "documents")
    sh = _hashed_gram_rows(d, 8, ["doc_id", "source"])
    bench = (
        sh.filter(F.pmod("doc_id", F.lit(10)) == 0).select("g").distinct()
    )
    return (
        sh.filter(F.pmod("doc_id", F.lit(10)) != 0)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id", "source")
        .agg(F.count("*").alias("n_overlap_grams"))
    )


# Shared by semdedup_prune AND its Arrow production twin
# semdedup_prune_arrow — one oracle, two execution paths, so the
# driver independently verifies the production path against the same
# spec (round-7 VERDICT item 4).
_SEMDEDUP_PRUNE_SQL = """
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), kk AS (
      SELECT GREATEST(32, CAST(ceil(sqrt(COUNT(*))) AS BIGINT)) AS k FROM v
    ), anchors AS (
      SELECT vec_id AS anchor_id, v AS av FROM v, kk WHERE vec_id < kk.k
    ), scored AS (
      SELECT x.vec_id, a.anchor_id,
             list_sum(list_transform(range(1, len(x.v) + 1),
                      i -> x.v[i] * a.av[i]))
               / (sqrt(list_sum(list_transform(x.v, e -> e * e)))
                  * sqrt(list_sum(list_transform(a.av, e -> e * e)))) AS ac
      FROM v x CROSS JOIN anchors a
    ), assign AS (
      SELECT vec_id, anchor_id AS cluster_id, ac AS c2c FROM (
        SELECT vec_id, anchor_id, ac,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY ac DESC, anchor_id ASC) AS rn
        FROM scored
      ) WHERE rn = 1
    ), m AS (
      SELECT a.vec_id, a.cluster_id, a.c2c, x.v
      FROM assign a JOIN v x USING (vec_id)
    ), losers AS (
      SELECT DISTINCT CASE
               WHEN a.c2c > b.c2c THEN a.vec_id
               WHEN b.c2c > a.c2c THEN b.vec_id
               ELSE b.vec_id END AS vec_id
      FROM m a JOIN m b
        ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
      WHERE list_sum(list_transform(range(1, len(a.v) + 1),
                     i -> a.v[i] * b.v[i]))
              / (sqrt(list_sum(list_transform(a.v, e -> e * e)))
                 * sqrt(list_sum(list_transform(b.v, e -> e * e)))) >= 0.4
    )
    SELECT s.vec_id, CAST(s.cluster_id AS BIGINT) AS cluster_id,
           round(s.c2c, 6) AS centroid_cos,
           (l.vec_id IS NOT NULL) AS pruned
    FROM assign s LEFT JOIN losers l ON s.vec_id = l.vec_id
    """


@q("semdedup_prune", _SEMDEDUP_PRUNE_SQL)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. '23) semantic pruning: cluster
    embeddings with a coarse quantizer, compute pairwise cosine
    WITHIN each cluster only, and for every semantic-duplicate pair
    (cos >= 0.4) prune the member CLOSER to its centroid — the
    paper's keep-the-outlier rule, which preserves cluster diversity
    while dropping redundant interior points. Every vector gets a
    verdict row (vec_id, cluster_id, centroid_cos, pruned).

    The quantizer is the deterministic anchor stand-in used by
    dedup_embedding_cosine (the k smallest-id vectors, nearest-anchor
    assignment = one k-means E-step) so the oracle reproduces the
    exact clustering; a production run swaps in the sample-trained
    IVF centroids from operators/similarity.py — the plan shape is
    identical. k SCALES WITH THE CORPUS: k = max(32, ceil(sqrt(n)))
    (the IVF rule), computed declaratively from a 1-row broadcast
    aggregate — no driver collect, and the oracle mirrors it with a
    scalar subquery. With k ∝ sqrt(n) the only quadratic work,
    Σ bucket² over clusters, is O(n²/k) = O(n^1.5) worst-case and
    O(n) for balanced buckets — exactly how SemDeDup scales to
    LAION-5B; tests/test_semdedup_scaling.py pins that k grows
    across the sf0.001→sf0.1 fixtures and bounds realized pair
    counts. Tie-break: equal centroid distance prunes the larger
    vec_id."""
    if _vector_backend() == "arrow":
        return _semdedup_prune_arrow_impl(spark, sf_dir)
    from datasette_upload_csvs_spark.functions.vector import dot

    v, assign = _anchor_assignment(spark, sf_dir)
    m = assign.join(v, "vec_id")
    a = m.select(
        F.col("vec_id").alias("id_a"),
        F.col("cluster_id"),
        F.col("c2c").alias("c2c_a"),
        F.col("v").alias("v_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = m.select(
        F.col("vec_id").alias("id_b"),
        F.col("cluster_id"),
        F.col("c2c").alias("c2c_b"),
        F.col("v").alias("v_b"),
        F.col("nrm").alias("nrm_b"),
    )
    losers = (
        a.join(b, "cluster_id")
        .filter(F.col("id_a") < F.col("id_b"))
        # one fold + divide per pair; bit-identical to cosine()'s
        # inline tree (see _anchor_assignment)
        .filter(
            dot(F.col("v_a"), F.col("v_b"))
            / (F.col("nrm_a") * F.col("nrm_b"))
            >= 0.4
        )
        .select(
            F.when(F.col("c2c_a") > F.col("c2c_b"), F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("vec_id")
        )
        .distinct()
        .withColumn("_hit", F.lit(True))
    )
    return assign.join(losers, "vec_id", "left").select(
        "vec_id",
        F.col("cluster_id").cast("bigint").alias("cluster_id"),
        F.round("c2c", 6).alias("centroid_cos"),
        F.coalesce(F.col("_hit"), F.lit(False)).alias("pruned"),
    )


def _anchor_assignment(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Shared quantizer of the D4 pipeline (semdedup_prune +
    d4_prototype_prune): k = max(32, ceil(sqrt(n))) smallest-id
    anchor vectors (broadcast), nearest-anchor assignment as one
    k-rows-per-key window. Returns ``(v, assign)`` — the
    (vec_id, v, nrm) double-array frame (norm precomputed ONCE per
    vector behind the generator barrier, so the n×k scoring and the
    within-cluster pairwise pass pay one fold + a divide per pair
    instead of three folds; dot/(nrm·nrm) evaluates the exact tree
    cosine() builds, so every double is bit-identical to the
    oracle's inline form) and the (vec_id, cluster_id, c2c)
    assignment frame."""
    from datasette_upload_csvs_spark.functions.vector import (
        dot,
        double_array_frame,
        l2_norm,
    )

    # the n×k anchor scoring (dot+norm per anchor per vector) runs in
    # the scan stage: spread under-parallel inputs (r14; measured
    # semdedup_prune −0.6 s, d4 −0.13 s at sf0.1; see dedup._spread)
    emb = dedup._spread(load(spark, sf_dir, "embeddings"), "vec_id")
    v = double_array_frame(emb).withColumn("nrm", l2_norm(F.col("v")))

    kdf = v.agg(
        F.greatest(F.lit(32), F.ceil(F.sqrt(F.count("*"))))
        .cast("long")
        .alias("k")
    )
    anchors = (
        v.join(F.broadcast(kdf))
        .filter(F.col("vec_id") < F.col("k"))
        .select(
            F.col("vec_id").alias("anchor_id"),
            F.col("v").alias("av"),
            F.col("nrm").alias("anrm"),
        )
    )
    scored = v.join(F.broadcast(anchors)).select(
        "vec_id",
        "anchor_id",
        (dot(F.col("v"), F.col("av")) / (F.col("nrm") * F.col("anrm"))).alias(
            "ac"
        ),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("ac").desc(), F.col("anchor_id").asc()
    )
    assign = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("anchor_id").alias("cluster_id"),
            F.col("ac").alias("c2c"),
        )
    )
    return v, assign


# Shared by d4_prototype_prune and d4_prototype_prune_arrow — same
# one-oracle-two-paths arrangement as _SEMDEDUP_PRUNE_SQL.
_D4_PROTOTYPE_SQL = """
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), kk AS (
      SELECT GREATEST(32, CAST(ceil(sqrt(COUNT(*))) AS BIGINT)) AS k FROM v
    ), anchors AS (
      SELECT vec_id AS anchor_id, v AS av FROM v, kk WHERE vec_id < kk.k
    ), scored AS (
      SELECT x.vec_id, a.anchor_id,
             list_sum(list_transform(range(1, len(x.v) + 1),
                      i -> x.v[i] * a.av[i]))
               / (sqrt(list_sum(list_transform(x.v, e -> e * e)))
                  * sqrt(list_sum(list_transform(a.av, e -> e * e)))) AS ac
      FROM v x CROSS JOIN anchors a
    ), assign AS (
      SELECT vec_id, anchor_id AS cluster_id, ac AS c2c FROM (
        SELECT vec_id, anchor_id, ac,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY ac DESC, anchor_id ASC) AS rn
        FROM scored
      ) WHERE rn = 1
    ), ranked AS (
      SELECT vec_id, cluster_id, c2c,
             row_number() OVER (PARTITION BY cluster_id
                                ORDER BY c2c DESC, vec_id ASC)
               AS proto_rank,
             COUNT(*) OVER (PARTITION BY cluster_id) AS cnt
      FROM assign
    )
    SELECT vec_id, CAST(cluster_id AS BIGINT) AS cluster_id,
           round(c2c, 6) AS centroid_cos,
           proto_rank,
           proto_rank > CAST(FLOOR((3 * cnt) / 10.0) AS BIGINT) AS kept
    FROM ranked
    """


@q("d4_prototype_prune", _D4_PROTOTYPE_SQL)
def d4_prototype_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4's second stage (Tirumala et al. '23: SemDeDup, THEN drop
    the most PROTOTYPICAL points): within each cluster, rank by
    cosine-to-centroid descending and drop the top 30 % — the
    interior points a near-duplicate-free corpus still wastes epochs
    on; the kept tail is the diverse shell. Complements
    semdedup_prune (pairwise-duplicate pruning): the two registry
    entries ARE the D4 pipeline run in sequence.

    Same scale-parameterized quantizer as semdedup_prune
    (k = max(32, ceil(sqrt(n))), anchors broadcast, assignment via a
    k-rows-per-key window). The prune itself is one window over
    cluster partitions (bounded, no skew beyond cluster size) — no
    pairwise stage at all, so this is the cheaper D4 leg. The drop
    count floor((3·cnt)/10.0) stays on exact-integer-derived doubles,
    so both engines agree at every boundary."""
    if _vector_backend() == "arrow":
        return _d4_prototype_prune_arrow_impl(spark, sf_dir)
    v, assign = _anchor_assignment(spark, sf_dir)
    wc = Window.partitionBy("cluster_id")
    ranked = assign.select(
        "*",
        F.row_number()
        .over(wc.orderBy(F.col("c2c").desc(), F.col("vec_id").asc()))
        .alias("proto_rank"),
        F.count("*").over(wc).alias("cnt"),
    )
    return ranked.select(
        "vec_id",
        F.col("cluster_id").cast("bigint").alias("cluster_id"),
        F.round("c2c", 6).alias("centroid_cos"),
        "proto_rank",
        (
            F.col("proto_rank")
            > F.floor((F.lit(3) * F.col("cnt")) / F.lit(10.0)).cast("bigint")
        ).alias("kept"),
    )


def _semdedup_prune_arrow_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datasette_upload_csvs_spark.operators import semdedup_arrow

    emb = load(spark, sf_dir, "embeddings")
    return semdedup_arrow.semdedup_prune_arrow(emb)


def _d4_prototype_prune_arrow_impl(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from datasette_upload_csvs_spark.operators import semdedup_arrow

    emb = load(spark, sf_dir, "embeddings")
    return semdedup_arrow.d4_prototype_prune_arrow(emb)


@q("semdedup_prune_arrow", _SEMDEDUP_PRUNE_SQL)
def semdedup_prune_arrow_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION SemDeDup path as a first-class registry entry:
    operators/semdedup_arrow.py (one `V @ A.T` matmul per Arrow batch
    for assignment, one gram matrix per bounded cluster for the
    pairwise pass) against the SAME oracle SQL as semdedup_prune —
    the driver's independent harness verifies the fast path, not only
    the expression spec. Output is pinned EXACTLY equal to
    semdedup_prune by tests/test_semdedup_arrow.py (same quantizer,
    same keep-the-outlier rule, same tie semantics), which is what
    makes reusing the oracle verbatim sound."""
    return _semdedup_prune_arrow_impl(spark, sf_dir)


@q("d4_prototype_prune_arrow", _D4_PROTOTYPE_SQL)
def d4_prototype_prune_arrow_entry(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Production D4 stage-2 (prototype pruning) on the Arrow path,
    sharing d4_prototype_prune's oracle verbatim — exact-equality pin
    in tests/test_semdedup_arrow.py (same rank order, same integer
    floor cut)."""
    return _d4_prototype_prune_arrow_impl(spark, sf_dir)


# The DSIR weight table, as oracle-SQL CTEs shared by
# dsir_importance_weights (which materializes it) and
# dsir_resample_topk (which consumes it) — one definition, two
# oracles, so the pair can never drift.
_DSIR_WEIGHTS_CTES = f"""toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                x -> x <> '')) AS w
      FROM documents
    ), hashed AS (
      SELECT doc_id, CAST(md5_number_lower(w) % 4096 AS BIGINT) AS b
      FROM toks
    ), q_cnt AS (
      SELECT b, COUNT(*) AS qc FROM hashed GROUP BY b
    ), t_cnt AS (
      SELECT b, COUNT(*) AS tc FROM hashed WHERE doc_id % 10 = 0 GROUP BY b
    ), tots AS (
      SELECT (SELECT SUM(qc) FROM q_cnt) AS q_tot,
             (SELECT COALESCE(SUM(tc), 0) FROM t_cnt) AS t_tot
    ), lam AS (
      SELECT q.b,
             CAST(round(ln((1.0 * (COALESCE(t.tc, 0) + 1) / (tots.t_tot + 4096))
                           / (1.0 * (q.qc + 1) / (tots.q_tot + 4096))), 10)
                  AS DECIMAL(28,12)) AS lw
      FROM q_cnt q LEFT JOIN t_cnt t USING (b), tots
    ), per_doc AS (
      SELECT doc_id, b, COUNT(*) AS c
      FROM hashed WHERE doc_id % 10 <> 0 GROUP BY 1, 2
    )"""

_DSIR_WEIGHTS_SELECT = """SELECT p.doc_id,
           CAST(SUM(p.c) AS BIGINT) AS n_tokens,
           round(CAST(SUM(p.c * l.lw) AS DOUBLE), 6) AS log_weight
    FROM per_doc p JOIN lam l USING (b)
    GROUP BY p.doc_id"""


@q(
    "dsir_importance_weights",
    f"""
    WITH {_DSIR_WEIGHTS_CTES}
    {_DSIR_WEIGHTS_SELECT}
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. '23) data selection via importance
    resampling: represent each doc by hashed unigram counts (4096
    buckets), fit target and raw bag-of-buckets distributions
    (add-1 smoothed), and score every raw doc with its importance
    log-weight sum_b c_doc(b)*ln(p_target(b)/p_raw(b)). The target
    here is the doc_id%10=0 slice (the same held-out stand-in the
    contamination queries use); a production run points it at the
    high-quality domain sample. Downstream, docs are Gumbel-top-k
    resampled by this weight — the weight table is the expensive
    distributed part and what this query materializes.

    Scale shape: the bucket vocabulary is FIXED at 4096 regardless
    of corpus size (the point of hashing) — both distribution tables
    and the λ = log-ratio table are 4096 rows, broadcast back onto
    the per-doc bucket counts. Two corpus-sized shuffles total
    (bucket count, per-doc agg); everything else is constant-size.
    Portability: λ rounded to 10 places then decimal-summed
    (order-free), exact-integer ratios inside ln on both engines."""
    from datasette_upload_csvs_spark.functions.text import tokens as _toks

    # tokenize+md5-per-token is the wall and runs in the scan stage:
    # spread under-parallel inputs (wide scans pass through — r14,
    # measured 2.9 s -> 1.4 s at sf0.1; see dedup._spread)
    d = dedup._spread(load(spark, sf_dir, "documents"), "doc_id")
    hashed = d.select(
        "doc_id", F.explode(_toks(F.col("text"))).alias("w")
    ).select(
        "doc_id",
        F.pmod(_md5_low64(F.col("w")), F.lit(4096)).cast("bigint").alias("b"),
    )
    # ONE bucket-keyed shuffle computes BOTH distributions: the raw
    # count and the target-slice count fold into the same partial
    # aggregate (round-5 shipped them as two full passes over the
    # exploded token relation plus a 4096-row join to recombine —
    # at 100 TB that is a second corpus shuffle for no information).
    cnts = hashed.groupBy("b").agg(
        F.count("*").alias("qc"),
        F.count_if(F.pmod("doc_id", F.lit(10)) == 0).alias("tc"),
    )
    tots = cnts.agg(
        F.sum("qc").alias("q_tot"),
        F.coalesce(F.sum("tc"), F.lit(0)).alias("t_tot"),
    )
    lam = (
        cnts.crossJoin(F.broadcast(tots))
        .select(
            "b",
            # decimal(18,12), NOT (28,12): the per-doc product
            # c * lw must stay exact, and Spark's decimal-multiply
            # rule (precision p1+p2+1 capped at 38) silently ROUNDS
            # the product to scale 6 when the operand precisions are
            # too wide — (8,0)x(18,12) -> (27,12) stays exact.
            F.round(
                F.log(
                    ((F.coalesce(F.col("tc"), F.lit(0)) + 1)
                     / (F.col("t_tot") + 4096))
                    / ((F.col("qc") + 1) / (F.col("q_tot") + 4096))
                ),
                10,
            )
            .cast("decimal(18,12)")
            .alias("lw"),
        )
    )
    per_doc = (
        hashed.filter(F.pmod("doc_id", F.lit(10)) != 0)
        .groupBy("doc_id", "b")
        .agg(F.count("*").alias("c"))
    )
    return (
        per_doc.join(F.broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.round(
                F.sum(F.col("c").cast("decimal(8,0)") * F.col("lw"))
                .cast("double"),
                6,
            ).alias("log_weight"),
        )
    )


@q(
    "dsir_resample_topk",
    f"""
    WITH {_DSIR_WEIGHTS_CTES}, wts AS (
      {_DSIR_WEIGHTS_SELECT}
    ), keyed AS (
      SELECT doc_id, log_weight,
             CAST(log_weight AS DECIMAL(18,6))
             + CAST(round(-ln(-ln(
                 (CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 1048576
                       AS DOUBLE) + 1) / 1048578.0)), 6) AS DECIMAL(18,6))
               AS k
      FROM wts
    )
    SELECT doc_id, log_weight, CAST(k AS DOUBLE) AS sample_key,
           CAST(row_number() OVER (ORDER BY k DESC, doc_id) AS INTEGER)
             AS sample_rank
    FROM keyed
    ORDER BY k DESC, doc_id
    LIMIT 200
    """,
)
def dsir_resample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel-top-k importance resampling — the selection step of
    DSIR (Xie et al. '23, §2; the Gumbel-top-k trick is Vieira '14):
    drawing k docs WITHOUT replacement with probability ∝ their
    importance weight is equivalent to taking the top k by
    log_weight + Gumbel(0,1) noise. The noise is derandomized the
    way every sampler in this repo is (sampling.py): u = content
    hash of doc_id mapped into (0,1), g = -ln(-ln(u)) — so the
    "random" sample is reproducible bit-for-bit on both engines and
    across reruns, which is what a training pipeline wants anyway
    (resumable, auditable selections).

    Scale shape: the weight table is the expensive part (two
    corpus-sized shuffles, see dsir_importance_weights — shared CTEs
    keep this oracle and that one in lock-step); the selection adds
    only map-side key arithmetic and a TakeOrderedAndProject top-k
    (per-partition partial top-200, driver merge of 200-row heaps —
    never a global sort). The rank window runs AFTER the limit, over
    200 rows. Portability: key = decimal(18,6) sum of the rounded
    log-weight and rounded Gumbel term — exact addition, total order
    with doc_id tiebreak."""
    wts = dsir_importance_weights(spark, sf_dir)
    u = (
        F.pmod(_md5_low64(F.col("doc_id").cast("string")), F.lit(1048576))
        .cast("double")
        + 1
    ) / 1048578.0
    g = F.round(-F.log(-F.log(u)), 6)
    keyed = wts.select(
        "doc_id",
        "log_weight",
        (
            F.col("log_weight").cast("decimal(18,6)")
            + g.cast("decimal(18,6)")
        ).alias("k"),
    )
    top = keyed.orderBy(F.col("k").desc(), F.col("doc_id")).limit(200)
    w = Window.orderBy(F.col("k").desc(), F.col("doc_id"))
    return top.select(
        "doc_id",
        "log_weight",
        F.col("k").cast("double").alias("sample_key"),
        F.row_number().over(w).cast("int").alias("sample_rank"),
    )


@q(
    "ccnet_perplexity_buckets",
    f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                x -> x <> '')) AS w
      FROM documents
    ), freq AS (
      SELECT w, COUNT(*) AS cnt FROM toks GROUP BY w
    ), tot AS (SELECT SUM(cnt) AS tot FROM freq),
    scored AS (
      SELECT w, CAST(round(-ln(cnt / tot), 10) AS DECIMAL(28,12)) AS nll
      FROM freq, tot
    ), doc_nll AS (
      SELECT doc_id, round(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS avg_nll
      FROM toks JOIN scored USING (w)
      GROUP BY doc_id
    ), ltoks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text),
                                 '{SPLIT_RE}'), x -> x <> '') AS t
      FROM documents
    ), counts AS (
      SELECT doc_id,
             {{lang_counts}}
      FROM ltoks
    ), lang AS (
      SELECT doc_id,
           CASE WHEN hits_en >= greatest(hits_de, hits_fr, hits_es, 1) THEN 'en'
                WHEN hits_de >= greatest(hits_fr, hits_es, 1) THEN 'de'
                WHEN hits_fr >= greatest(hits_es, 1) THEN 'fr'
                WHEN hits_es >= 1 THEN 'es'
                ELSE 'und' END AS predicted_lang
      FROM counts
    ), j AS (
      SELECT n.doc_id, l.predicted_lang, n.avg_nll
      FROM doc_nll n JOIN lang l USING (doc_id)
    ), r AS (
      SELECT doc_id, predicted_lang, avg_nll,
             row_number() OVER (PARTITION BY predicted_lang
                                ORDER BY avg_nll, doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY predicted_lang) AS cnt
      FROM j
    )
    SELECT doc_id, predicted_lang, avg_nll,
           CASE (3 * (rk - 1)) // cnt WHEN 0 THEN 'head'
                WHEN 1 THEN 'middle' ELSE 'tail' END AS ppl_bucket
    FROM r
    """.format(lang_counts=_LANG_COUNTS_SQL),
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. '20 §4.3):
    score every doc with the corpus-LM negative log-prob (the KenLM
    stand-in text_unigram_logprob uses), then split each LANGUAGE
    into head/middle/tail terciles by that score — the buckets CCNet
    publishes and pretraining recipes sample from (keep head+middle,
    downsample tail).

    The tercile boundary is rank-based ((3·(rank−1)) div count, exact
    integer math), NOT an interpolated percentile — interpolation is
    engine-specific at the last ulp, ranks are not. The within-
    language rank does NOT use a per-language window (5 languages →
    5 giant partitions = the skew the verdict flagged on
    balanced_shards): it is the repo's two-phase distributed rank —
    (1) row_number within (lang, coarse nll band), a many-partition
    window; (2) band counts prefix-summed per language, a window
    over ~40 rows per language; rank = band prefix + within-band
    row_number. Identical to the oracle's single window by
    construction (the band is a prefix of the sort key)."""
    docs = load(spark, sf_dir, "documents")
    nll = textstats.unigram_logprob(docs).select("doc_id", "avg_nll")
    lang = textstats.language_id(docs).select("doc_id", "predicted_lang")
    j = nll.join(lang, "doc_id")
    banded = j.withColumn(
        "_band", F.floor(F.col("avg_nll") * 4).cast("bigint")
    )
    w_in = Window.partitionBy("predicted_lang", "_band").orderBy(
        "avg_nll", "doc_id"
    )
    within = banded.withColumn("_rn", F.row_number().over(w_in))
    band_counts = banded.groupBy("predicted_lang", "_band").agg(
        F.count("*").alias("_bc")
    )
    w_pre = (
        Window.partitionBy("predicted_lang")
        .orderBy("_band")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefixes = band_counts.select(
        "predicted_lang",
        "_band",
        F.coalesce(F.sum("_bc").over(w_pre), F.lit(0)).alias("_pre"),
    )
    lang_counts = j.groupBy("predicted_lang").agg(F.count("*").alias("cnt"))
    ranked = (
        within.join(F.broadcast(prefixes), ["predicted_lang", "_band"])
        .join(F.broadcast(lang_counts), "predicted_lang")
        .withColumn("rk", F.col("_pre") + F.col("_rn"))
    )
    bucket_i = F.expr("(3 * (rk - 1)) div cnt")
    return ranked.select(
        "doc_id",
        "predicted_lang",
        "avg_nll",
        F.when(bucket_i == 0, F.lit("head"))
        .when(bucket_i == 1, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("ppl_bucket"),
    )


@q(
    "quality_classifier_score",
    f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                 x -> x <> '') AS t
      FROM documents
    ), feats AS (
      SELECT doc_id, unnest(t) AS f FROM toks
      UNION ALL
      SELECT doc_id, t[i] || ' ' || t[i + 1] AS f
      FROM toks, UNNEST(range(1, greatest(len(t), 1))) AS u(i)
    ), weighted AS (
      SELECT doc_id,
             CAST(md5_number_lower('qcw:' ||
               CAST(CAST(md5_number_lower(f) % 4096 AS BIGINT) AS VARCHAR))
               % 2001 AS BIGINT) - 1000 AS w_milli
      FROM feats
    ), agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_features,
             SUM(w_milli) AS sw
      FROM weighted GROUP BY doc_id
    )
    SELECT doc_id, n_features,
           round(sw / 1000.0 / n_features, 6) AS score,
           round(1.0 / (1.0 + exp(-round(sw / 1000.0 / n_features, 6))), 6)
             AS prob,
           sw >= 0 AS keep
    FROM agg
    """,
)
def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style linear quality classifier — the filtering model
    of GPT-3 (Brown et al. '20 App. A), CCNet, and LLaMA: features
    are the doc's unigrams + word bigrams hashed into 4096 buckets
    (fastText's hashing trick), the score is the mean of per-bucket
    weights through a sigmoid, keep = score ≥ 0. The weight table is
    a frozen stand-in derived from a content hash of the bucket id
    (uniform in [-1, 1], millis-exact integers) — a production run
    broadcasts its trained weight vector instead; the plan is
    identical because the weight lookup is a pure per-feature
    expression, not a join.

    Scale shape: everything before the single per-doc aggregation is
    map-side (tokenize → hash → weight, no feature dictionary, no
    shuffle by feature — the entire point of feature hashing at
    100 TB). Integer milli-weights make the score sum exact;
    the only floats are two final IEEE-identical divisions and one
    rounded sigmoid."""
    d = load(spark, sf_dir, "documents")
    t = _text_tokens(F.col("text"))
    n = F.size(t)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.array_join(F.slice(t, i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = d.select(
        "doc_id", F.explode(F.concat(t, bigrams)).alias("f")
    )
    bucket = F.pmod(_md5_low64(F.col("f")), F.lit(4096)).cast("bigint")
    w_milli = (
        F.pmod(
            _md5_low64(F.concat(F.lit("qcw:"), bucket.cast("string"))),
            F.lit(2001),
        ).cast("bigint")
        - 1000
    )
    agg = (
        feats.select("doc_id", w_milli.alias("w_milli"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_features"),
            F.sum("w_milli").alias("sw"),
        )
    )
    score = F.round(F.col("sw") / 1000.0 / F.col("n_features"), 6)
    return agg.select(
        "doc_id",
        "n_features",
        score.alias("score"),
        F.round(1.0 / (1.0 + F.exp(-score)), 6).alias("prob"),
        (F.col("sw") >= 0).alias("keep"),
    )


_SUBSTR_SPAN_CTES = f"""toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                 x -> x <> '') AS t
      FROM documents
    ), win AS (
      SELECT doc_id, CAST(i AS BIGINT) AS i,
             md5(array_to_string(t[i:i+15], ' ')) AS h
      FROM toks, UNNEST(range(1, greatest(len(t) - 14, 1))) AS u(i)
    ), dup AS (
      SELECT h FROM win GROUP BY h HAVING COUNT(*) >= 2
    ), dupw AS (
      SELECT w.doc_id, w.i FROM win w JOIN dup USING (h)
    ), flagged AS (
      SELECT doc_id, i,
             CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i)
                       > 15 THEN 1 ELSE 0 END AS brk
      FROM dupw
    ), grouped AS (
      SELECT doc_id, i,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS UNBOUNDED PRECEDING) AS grp
      FROM flagged
    ), spans AS (
      SELECT doc_id, CAST(MIN(i) AS BIGINT) AS span_start,
             CAST(MAX(i) + 16 - MIN(i) AS BIGINT) AS span_len
      FROM grouped
      GROUP BY doc_id, grp
    )"""


def _exact_substr_span_frame(d: DataFrame) -> DataFrame:
    """(doc_id, span_start, span_len): the maximal duplicated-window
    token spans — shared by the span-list entry and the removal
    transform (see dedup_exact_substr_spans for the full design
    rationale)."""
    # 1:1 explode(array(tokens)) generator boundary: materialize the
    # token array once per row, or CollapseProject inlines the
    # tokenizer split into all 16 F.get slots per window
    toks = d.select(
        "doc_id", F.explode(F.array(_text_tokens(F.col("text")))).alias("_t")
    )
    t = F.col("_t")
    n = F.size(t)
    idx = F.when(n >= 16, F.sequence(F.lit(1), n - 15)).otherwise(
        F.array().cast("array<int>")
    )
    win = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    i.cast("bigint").alias("i"),
                    F.xxhash64(
                        *[F.get(t, i + j - 1) for j in range(16)]
                    ).alias("h"),
                ),
            )
        ).alias("w"),
    ).select("doc_id", "w.i", "w.h")
    dup = win.groupBy("h").count().filter(F.col("count") >= 2).select("h")
    dupw = win.join(dup, "h").select("doc_id", "i")
    w_ord = Window.partitionBy("doc_id").orderBy("i")
    flagged = dupw.withColumn(
        "brk",
        F.when(F.col("i") - F.lag("i").over(w_ord) > 15, F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    grouped = flagged.withColumn(
        "grp",
        F.sum("brk").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return grouped.groupBy("doc_id", "grp").agg(
        F.min("i").alias("span_start"),
        (F.max("i") + 16 - F.min("i")).alias("span_len"),
    ).select("doc_id", "span_start", "span_len")


@q(
    "dedup_exact_substr_spans",
    "WITH " + _SUBSTR_SPAN_CTES + """
    SELECT doc_id, span_start, span_len FROM spans
    """,
)
def dedup_exact_substr_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr span extraction (Lee et al. '22 §4.1): the actual
    REMOVAL artifact — for every document, the maximal token spans
    covered by some 16-token window that occurs ≥2 times anywhere in
    the corpus (their threshold is 50 tokens over a suffix array;
    16 suits the short synthetic docs, same semantics at window
    granularity). dedup_ngram_coverage reports the per-doc duplicated
    FRACTION; this query emits the (span_start, span_len) cut list a
    pipeline feeds to the actual text surgery.

    Spark-shaped suffix-array substitute: hash every k-token window
    (multi-arg xxhash64 straight from the 16 token slots — the
    _shingle_hashes convention; the window STRING is never
    materialized and the hash never crosses engines, the oracle only
    has to agree on window EQUALITY), count window-hash occurrences
    (ONE corpus shuffle with map-side partial aggregation), semi-join
    the ≥2 hashes back (1 row per key on the build side — a hot
    boilerplate window skews nothing, AQE splits the probe), then
    merge overlapping duplicated windows into maximal spans with the
    gap-≤15 islands trick: two per-doc-keyed windows (lag → running
    sum of breaks) and a final (doc, island) aggregate. Per-doc
    windows partition on doc_id — millions of small partitions, no
    giant-key skew."""
    return _exact_substr_span_frame(load(spark, sf_dir, "documents"))


@q(
    "dedup_exact_substr_removed",
    "WITH " + _SUBSTR_SPAN_CTES + """
    , sp AS (
      SELECT doc_id,
             list({'s': span_start, 'l': span_len}) AS spans
      FROM spans GROUP BY doc_id
    ), kx AS (
      SELECT toks.doc_id, t, spans,
             list_filter(range(1, len(t) + 1),
               i -> spans IS NULL OR len(list_filter(spans,
                      x -> x.s <= i AND i < x.s + x.l)) = 0) AS kept
      FROM toks LEFT JOIN sp USING (doc_id)
    )
    SELECT doc_id,
           -- array_to_string([]) is NULL in DuckDB; Spark's
           -- concat_ws over an empty array is '' — fully-removed
           -- docs must agree
           COALESCE(array_to_string(list_transform(kept, i -> t[i]), ' '),
                    '') AS clean_text,
           CAST(len(t) - len(kept) AS BIGINT) AS n_tokens_removed
    FROM kx
    """,
)
def dedup_exact_substr_removed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr REMOVAL (Lee et al. '22 §4.1, the actual surgery):
    every token covered by a duplicated-window span (the cut list
    dedup_exact_substr_spans emits) is dropped and the remaining
    tokens reassembled — the cleaned corpus a dedup pipeline
    actually trains on, with the per-doc removed-token count as the
    audit column.

    Scale shape: the span pipeline is the shared helper (one corpus
    window shuffle + per-doc-keyed islands); the surgery itself is a
    LEFT join of docs to their per-doc span LIST (spans per doc are
    few — merged maximal islands, not raw windows) and a map-side
    higher-order filter over token indices: exists(spans, covers(i))
    per token, no extra shuffle beyond the per-doc span collect. The
    token array materializes once per row behind the generator
    barrier (the CollapseProject re-tokenization trap)."""
    docs = load(spark, sf_dir, "documents")
    spans = _exact_substr_span_frame(docs)
    sp = spans.groupBy("doc_id").agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"), F.col("span_len").alias("l")
            )
        ).alias("spans")
    )
    toks = docs.select(
        "doc_id", F.explode(F.array(_text_tokens(F.col("text")))).alias("_t")
    )
    t = F.col("_t")
    joined = toks.join(sp, "doc_id", "left")
    idx = F.when(F.size(t) >= 1, F.sequence(F.lit(1), F.size(t))).otherwise(
        F.array().cast("array<int>")
    )
    covers = lambda i: F.exists(  # noqa: E731
        F.col("spans"),
        lambda x: (x["s"] <= i) & (i.cast("bigint") < x["s"] + x["l"]),
    )
    kept = F.filter(idx, lambda i: F.col("spans").isNull() | ~covers(i))
    return joined.select(
        "doc_id",
        F.concat_ws(
            " ", F.transform(kept, lambda i: F.element_at(t, i))
        ).alias("clean_text"),
        (F.size(t) - F.size(kept)).cast("bigint").alias("n_tokens_removed"),
    )



@q(
    "gopher_quality_filters",
    f"""
    WITH t AS (
      SELECT doc_id, list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                 x -> x <> '') AS w
      FROM documents
    ), m AS (
      SELECT doc_id,
             len(w) AS n_words,
             -- coalesce: list_sum([]) is NULL in DuckDB, but the
             -- Spark fold's identity is 0 — zero-word docs must
             -- agree (mwl 0.0, keep=false) in both engines
             1.0 * coalesce(list_sum(list_transform(w, x -> length(x))), 0)
               / greatest(len(w), 1) AS mwl,
             1.0 * len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]')))
               / greatest(len(w), 1) AS fa,
             len(list_filter(w, x -> list_contains([{_STOP_SQL}], x)))
               AS n_stop_hits
      FROM t
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           round(mwl, 6) AS mean_word_len,
           round(fa, 6) AS frac_alpha_words,
           CAST(n_stop_hits AS BIGINT) AS n_stop_hits,
           (n_words BETWEEN 20 AND 100000
            AND mwl BETWEEN 3 AND 10
            AND fa >= 0.8
            AND n_stop_hits >= 2) AS keep
    FROM m
    """,
)
def gopher_quality_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher document-quality rules (Rae et al. '21 §A1.1, the
    non-repetition half — curation_repetition_stats is the other):
    word-count bounds, mean-word-length band 3-10, ≥80 % of words
    containing an alphabetic character, and ≥2 stop-word hits (their
    8-word required list; ours is functions.text.STOPWORDS). Bounds
    adapted to the short synthetic docs (min 20 words vs the paper's
    50); the structure — per-doc signals + conjunctive keep verdict —
    is the published recipe. Symbol-ratio and bullet/ellipsis line
    rules are omitted: the synthetic corpus has no symbols or line
    structure to fire them.

    Scale shape: pure map-side codegen over the token array — no
    explode, no shuffle, no Python. At 100 TB this is the cheapest
    filter in the pipeline and runs fused with the parquet scan."""
    d = load(spark, sf_dir, "documents")
    w = _text_tokens(F.col("text"))
    n = F.size(w)
    nz = F.greatest(n, F.lit(1)).cast("double")
    mwl = (
        F.aggregate(
            w, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        ).cast("double")
        / nz
    )
    fa = (
        F.size(F.filter(w, lambda x: x.rlike("[a-zA-Z]"))).cast("double")
        / nz
    )
    n_stop = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    keep = (
        n.between(20, 100000)
        & mwl.between(3.0, 10.0)
        & (fa >= 0.8)
        & (n_stop >= 2)
    )
    return d.select(
        "doc_id",
        n.cast("bigint").alias("n_words"),
        F.round(mwl, 6).alias("mean_word_len"),
        F.round(fa, 6).alias("frac_alpha_words"),
        n_stop.cast("bigint").alias("n_stop_hits"),
        keep.alias("keep"),
    )


@q(
    "source_temperature_mix",
    f"""
    WITH t AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(list_filter(string_split_regex(text,
                      '{SPLIT_RE}'), x -> x <> ''))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ), g AS (SELECT SUM(n_tokens) AS tot FROM t),
    p AS (
      SELECT source, n_docs, n_tokens,
             1.0 * n_tokens / tot AS p_raw,
             sqrt(1.0 * n_tokens / tot) AS q_un
      FROM t, g
    ), s AS (
      SELECT *, CAST(SUM(CAST(q_un AS DECIMAL(28,18))) OVER ()
                     AS DOUBLE) AS z
      FROM p
    )
    SELECT source, n_docs, n_tokens,
           round(p_raw, 6) AS p_raw,
           round(q_un / z, 6) AS p_temp,
           round((q_un / z) / p_raw, 6) AS sample_weight
    FROM s
    """,
)
def source_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (the XLM/mT5 multinomial
    recipe: sample source i with p_i ∝ (n_i/N)^α) — the standard
    counter to head-source dominance in multilingual / multi-source
    pretraining. α = 0.5 (Lample & Conneau '19's constant) so the
    flattening is sqrt — correctly rounded under IEEE 754 in BOTH
    engines, unlike pow, whose libm can differ by an ulp and flip a
    round() boundary; the normalization sum goes through the repo's
    DECIMAL order-independent-sum discipline (same reason _dsum
    exists). Emits per source the raw token share, the flattened
    share, and the per-doc resampling weight (p_temp/p_raw) a
    weighted sampler consumes (sample_weighted_orders is the
    sampling mechanism twin).

    Scale shape: one partial-aggregated groupBy on source (source
    cardinality is tiny), then the normalization constant rides a
    single-partition window over the |sources|-row aggregate — the
    corpus is read once, map-side."""
    d = load(spark, sf_dir, "documents")
    t = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(_text_tokens(F.col("text"))))
        .cast("bigint")
        .alias("n_tokens"),
    )
    tot = Window.partitionBy()
    p_raw = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(tot)
    q_un = F.sqrt(p_raw)
    p = t.select("source", "n_docs", "n_tokens", p_raw.alias("p_raw"),
                 q_un.alias("q_un"))
    z = (
        F.sum(F.col("q_un").cast("decimal(28,18)")).over(tot).cast("double")
    )
    p_temp = F.col("q_un") / z
    return p.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round("p_raw", 6).alias("p_raw"),
        F.round(p_temp, 6).alias("p_temp"),
        F.round(p_temp / F.col("p_raw"), 6).alias("sample_weight"),
    )


@q(
    "dedup_cross_source_matrix",
    """
    WITH """ + _EDGE_CTES_BODY + """
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM good JOIN documents da ON id_a = da.doc_id
              JOIN documents db ON id_b = db.doc_id
    GROUP BY 1, 2
    """,
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source near-duplication matrix: verified near-dup pairs
    cross-tabbed by unordered source pair. The audit that catches one
    source republishing another (mirror sites, scraped aggregators) —
    within-source redundancy (the diagonal) is mixture waste, but
    OFF-diagonal mass means source-level dedup priorities and
    possible train/eval contamination between supposedly independent
    sources. dedup_rate_by_source gives the per-source marginal; this
    is the joint table.

    Scale shape: edges come from the sub-quadratic MinHash pipeline
    (banded candidates + exact-Jaccard verify, recall-floored — the
    same pair set the recursive oracle closes over); the pair→source
    decoration is two joins keyed on doc_id against the (doc_id,
    source) projection, then a tiny (|sources|²) aggregate."""
    d = load(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_dup_pairs(
        d, threshold=0.7, exact_floor_max_df=_FLOOR_MAX_DF
    ).select("id_a", "id_b")
    src = d.select("doc_id", "source")
    sa = src.withColumnRenamed("doc_id", "id_a").withColumnRenamed(
        "source", "sa"
    )
    sb = src.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
        "source", "sb"
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .groupBy(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .agg(F.count("*").alias("n_pairs"))
    )


# ====================================================================
# curation pipeline funnel — the published-method stages composed
# ====================================================================


@q(
    "curation_pipeline_funnel",
    f"""
    WITH t AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(text, '{SPLIT_RE}'),
                         x -> x <> '') AS w
      FROM documents WHERE doc_id % 10 <> 0
    ), s1 AS (
      SELECT doc_id, text, len(w) AS n_tok FROM t
    ), m AS (
      SELECT doc_id, text, len(w) AS n_tok,
             len(w) AS n_words,
             1.0 * coalesce(list_sum(list_transform(w, x -> length(x))), 0)
               / greatest(len(w), 1) AS mwl,
             1.0 * len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]')))
               / greatest(len(w), 1) AS fa,
             len(list_filter(w, x -> list_contains([{_STOP_SQL}], x)))
               AS n_stop_hits
      FROM t
    ), s2 AS (
      SELECT doc_id, text, n_tok FROM m
      WHERE n_words BETWEEN 20 AND 100000
        AND mwl BETWEEN 3 AND 10 AND fa >= 0.8 AND n_stop_hits >= 2
    ), toksall AS (
      SELECT doc_id, list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                 x -> x <> '') AS tt
      FROM documents
    ), shall AS (
      SELECT DISTINCT doc_id, array_to_string(tt[i:i+7], ' ') AS g
      FROM toksall, UNNEST(range(1, greatest(len(tt) - 6, 2))) AS u(i)
    ), bench AS (
      SELECT DISTINCT g FROM shall WHERE doc_id % 10 = 0
    ), contam AS (
      SELECT DISTINCT s.doc_id FROM shall s JOIN bench USING (g)
      WHERE s.doc_id % 10 <> 0
    ), s3 AS (
      SELECT * FROM s2
      WHERE doc_id NOT IN (SELECT doc_id FROM contam)
    ), s4 AS (
      SELECT doc_id, n_tok FROM (
        SELECT doc_id, n_tok,
               row_number() OVER (PARTITION BY md5(text)
                                  ORDER BY doc_id) AS rn
        FROM s3
      ) WHERE rn = 1
    )
    SELECT * FROM (
      SELECT 'raw' AS stage, 1 AS stage_order,
             COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      FROM s1
      UNION ALL
      SELECT 'gopher_quality', 2, COUNT(*), CAST(SUM(n_tok) AS BIGINT)
      FROM s2
      UNION ALL
      SELECT 'decontaminated', 3, COUNT(*), CAST(SUM(n_tok) AS BIGINT)
      FROM s3
      UNION ALL
      SELECT 'exact_deduped', 4, COUNT(*), CAST(SUM(n_tok) AS BIGINT)
      FROM s4
    )
    """,
)
def curation_pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The published-method curation pipeline composed end-to-end,
    reported as a funnel audit — one row per stage with surviving
    doc/token counts, the first table any dataset card or curation
    review asks for. Stages over the train slice (doc_id%10<>0; the
    %10=0 slice stands in for held-out benchmarks as everywhere
    else):

      raw → Gopher quality rules (Rae et al. '21 §A1.1, via the same
      verdict gopher_quality_filters emits) → benchmark 8-gram
      decontamination (GPT-3/Gopher screen, broadcast benchmark
      grams) → exact dedup (md5 rank-1 representative per content
      group, as dedup_exact_ranks).

    Each stage REUSES the standalone registry entry's logic, so the
    funnel cannot drift from the individually-verified operators.

    Scale shape: the quality stage is map-only; decontamination adds
    one broadcast gram join + a distinct on contaminated doc ids
    (benchmark-overlap-sized); exact dedup is one hash-partitioned
    window; the four stage aggregates are partial-aggregated counts
    unioned into a 4-row result. Nothing quadratic, nothing
    collected."""
    d = load(spark, sf_dir, "documents")
    train = d.filter(F.pmod("doc_id", F.lit(10)) != 0)
    s1 = train.select(
        "doc_id", "text", F.size(_text_tokens(F.col("text"))).alias("n_tok")
    )
    gk = (
        gopher_quality_filters(spark, sf_dir)
        .filter(F.col("keep"))
        .select("doc_id")
    )
    s2 = s1.join(gk, "doc_id", "left_semi")
    sh = _hashed_gram_rows(d, 8, ["doc_id"])
    bench = (
        sh.filter(F.pmod("doc_id", F.lit(10)) == 0).select("g").distinct()
    )
    contam = (
        sh.filter(F.pmod("doc_id", F.lit(10)) != 0)
        .join(F.broadcast(bench), "g")
        .select("doc_id")
        .distinct()
    )
    s3 = s2.join(contam, "doc_id", "left_anti")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    s4 = (
        s3.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )

    def agg(frame, stage, order):
        return frame.agg(
            F.lit(stage).alias("stage"),
            F.lit(order).cast("int").alias("stage_order"),
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        ).select("stage", "stage_order", "n_docs", "n_tokens")

    return (
        agg(s1, "raw", 1)
        .unionByName(agg(s2, "gopher_quality", 2))
        .unionByName(agg(s3, "decontaminated", 3))
        .unionByName(agg(s4, "exact_deduped", 4))
    )


@q(
    "curation_funnel_staged",
    f"""
    WITH RECURSIVE t AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(text, '{SPLIT_RE}'),
                         x -> x <> '') AS w
      FROM documents WHERE doc_id % 10 <> 0
    ), s0 AS (
      SELECT doc_id, text, len(w) AS n_tok FROM t
    ), m AS (
      SELECT doc_id, text, len(w) AS n_tok,
             len(w) AS n_words,
             1.0 * coalesce(list_sum(list_transform(w, x -> length(x))), 0)
               / greatest(len(w), 1) AS mwl,
             1.0 * len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]')))
               / greatest(len(w), 1) AS fa,
             len(list_filter(w, x -> list_contains([{_STOP_SQL}], x)))
               AS n_stop_hits
      FROM t
    ), s1 AS (
      SELECT doc_id, text, n_tok FROM m
      WHERE n_words BETWEEN 20 AND 100000
        AND mwl BETWEEN 3 AND 10 AND fa >= 0.8 AND n_stop_hits >= 2
    ), s2 AS (
      SELECT doc_id, text, n_tok FROM (
        SELECT doc_id, text, n_tok,
               row_number() OVER (PARTITION BY md5(text)
                                  ORDER BY doc_id) AS rn
        FROM s1
      ) WHERE rn = 1
    ), toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                 x -> x <> '') AS t
      FROM s2
    ), sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, UNNEST(range(1, greatest(len(t) - 1, 2))) AS u(i)
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), pr AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), good AS (
      SELECT id_a, id_b
      FROM pr JOIN sizes sa ON id_a = sa.doc_id
              JOIN sizes sb ON id_b = sb.doc_id
      WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.7
    ), edges AS (
      SELECT id_a AS v, id_b AS n FROM good
      UNION
      SELECT id_b AS v, id_a AS n FROM good
    ), walk(v, c) AS (
      SELECT v, v FROM (SELECT DISTINCT v FROM edges) t
      UNION
      SELECT e.v, w.c FROM edges e JOIN walk w ON w.v = e.n
    ), comp AS (
      SELECT v, MIN(c) AS component FROM walk GROUP BY v
    ), s3 AS (
      SELECT s2.doc_id, s2.text, s2.n_tok
      FROM s2 LEFT JOIN comp ON s2.doc_id = comp.v
      WHERE COALESCE(comp.component, s2.doc_id) = s2.doc_id
    ), toksall AS (
      SELECT doc_id, list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                 x -> x <> '') AS tt
      FROM documents WHERE doc_id % 10 = 0
    ), bench AS (
      SELECT DISTINCT array_to_string(tt[i:i+7], ' ') AS g
      FROM toksall, UNNEST(range(1, greatest(len(tt) - 6, 2))) AS u(i)
    ), toks3 AS (
      SELECT doc_id, list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                 x -> x <> '') AS tt
      FROM s3
    ), sh3 AS (
      SELECT DISTINCT doc_id, array_to_string(tt[i:i+7], ' ') AS g
      FROM toks3, UNNEST(range(1, greatest(len(tt) - 6, 2))) AS u(i)
    ), contam AS (
      SELECT DISTINCT s.doc_id FROM sh3 s JOIN bench USING (g)
    ), s4 AS (
      SELECT doc_id, n_tok FROM s3
      WHERE doc_id NOT IN (SELECT doc_id FROM contam)
    )
    SELECT * FROM (
      SELECT 'scan' AS stage, 1 AS stage_order,
             COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      FROM s0
      UNION ALL
      SELECT 'gopher_quality', 2, COUNT(*), CAST(SUM(n_tok) AS BIGINT)
      FROM s1
      UNION ALL
      SELECT 'exact_dedup', 3, COUNT(*), CAST(SUM(n_tok) AS BIGINT)
      FROM s2
      UNION ALL
      SELECT 'near_dup_groups', 4, COUNT(*), CAST(SUM(n_tok) AS BIGINT)
      FROM s3
      UNION ALL
      SELECT 'decontaminated', 5, COUNT(*), CAST(SUM(n_tok) AS BIGINT)
      FROM s4
    )
    """,
)
def curation_funnel_staged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STAGED composed funnel (pipeline.run_curation_funnel) as
    an oracle-checked registry entry: raw → Gopher quality → exact
    dedup → near-dup GROUPS (banded MinHash star edges + connected
    components, keep the canonical member — the stage the 4-stage
    curation_pipeline_funnel lacks) → benchmark 8-gram
    decontamination, reported as per-stage doc/token counts.

    Unlike the lazy single-plan funnel, this runs the materializing
    pipeline — one corpus scan, each stage consuming the previous
    stage's localCheckpoint (the execution shape
    BENCH_FUNNEL_SCALE.json measures at 1×–128×, and
    tests/test_pipeline_funnel.py pins scan-free stage plans for).
    The oracle replays every stage in SQL: the Gopher rules, the
    md5 rank-1 exact dedup, the exact-Jaccard ≥ 0.7 transitive
    closure over the SURVIVOR set (the same floor+bands coverage
    argument as dedup_groups makes Spark's LSH edge set equal the
    exact closure), and the 8-gram decontamination screen. The
    result is Θ(stages) rows, so collecting the staged counts into
    a local frame is driver-safe at any corpus size."""
    from datasette_upload_csvs_spark.pipeline import run_curation_funnel

    d = load(spark, sf_dir, "documents")
    # release_stage_frames: this entry only reads the staged COUNTS,
    # so each stage's corpus-sized localCheckpoint is freed the moment
    # the next stage materializes (guide §5 storage hygiene).
    # clearCache() cannot drop checkpoint blocks (they are not
    # cacheManager entries), so without the release every invocation
    # leaks ~6 stage frames until a driver GC — measured in the r14
    # bench twin loop as a monotone per-run slowdown (median 17.5 s
    # on a run whose first pair costs ~9 s; see OPTIMIZATION_r14.md).
    stages, _, _ = run_curation_funnel(
        d.filter(F.pmod("doc_id", F.lit(10)) != 0),
        benchmark=d.filter(F.pmod("doc_id", F.lit(10)) == 0),
        exact_floor_max_df=_FLOOR_MAX_DF,
        release_stage_frames=True,
    )
    order = {
        "scan": 1,
        "gopher_quality": 2,
        "exact_dedup": 3,
        "near_dup_groups": 4,
        "decontaminated": 5,
    }
    rows = [
        (s.name, order[s.name], s.n_docs, s.n_tokens)
        for s in stages
        if s.name in order
    ]
    return spark.createDataFrame(
        rows,
        "stage string, stage_order int, n_docs bigint, n_tokens bigint",
    )


# ====================================================================
# UniMax budget allocation (Chung et al. ICLR '23)
# ====================================================================


@q(
    "unimax_source_mix",
    f"""
    WITH t AS (
      SELECT source,
             CAST(SUM(len(list_filter(string_split_regex(text,
                      '{SPLIT_RE}'), x -> x <> ''))) AS BIGINT) AS c
      FROM documents GROUP BY source
    ), g AS (
      SELECT CAST(SUM(c) AS BIGINT) AS tot, COUNT(*) AS n FROM t
    ), o AS (
      SELECT source, c, (3 * c) / 2.0 AS cap,
             ROW_NUMBER() OVER (ORDER BY (3 * c) / 2.0, source) AS k,
             COALESCE(SUM((3 * c) / 2.0) OVER (ORDER BY (3 * c) / 2.0,
                      source
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS pre
      FROM t
    ), u AS (
      SELECT o.*, ((7 * g.tot) / 5.0 - pre) / (g.n - k + 1) AS uk
      FROM o, g
    ), piv AS (
      SELECT MIN(k) AS p FROM u WHERE cap > uk
    ), star AS (
      SELECT uk AS ustar FROM u, piv WHERE u.k = piv.p
    )
    SELECT u.source, u.c AS n_tokens, u.cap AS cap_tokens,
           round(CASE WHEN piv.p IS NULL OR u.k < piv.p
                      THEN u.cap ELSE star.ustar END,
                 4) AS alloc_tokens,
           round(CASE WHEN piv.p IS NULL OR u.k < piv.p
                      THEN u.cap ELSE star.ustar END
                 / u.c, 6) AS epochs_used
    FROM u LEFT JOIN piv ON TRUE LEFT JOIN star ON TRUE
    """,
)
def unimax_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax (Chung et al. ICLR '23) budget allocation: distribute
    a total token budget across sources as uniformly as possible,
    capping every source at E epochs of its own corpus — the
    repetition-bounded alternative to temperature sampling
    (source_temperature_mix), which can silently run tiny sources
    for hundreds of epochs. E = 1.5, budget B = 1.4x corpus
    tokens here (chosen so BOTH branches — capped-out small sources
    AND equal-share large ones — are exercised at fixture scale).
    Caps and prefix sums are exact half-integers in double, so the
    running window sum is bit-identical in both engines.

    The water-filling closed form replaces UniMax's sequential loop:
    sort sources ascending by cap, prefix-sum the caps; source k's
    fair share is u_k = (B - prefix_{{k-1}})/(n-k+1); the pivot p is
    the first k whose cap exceeds its fair share — everything before
    p gets its full cap, everything from p on gets the EQUAL share
    u_p. All comparisons are on doubles derived from exact integers,
    so both engines branch identically.

    Scale shape: one partial-aggregated groupBy on source, then all
    window/pivot arithmetic runs on the |sources|-row aggregate —
    corpus read once, map-side; the windows are single-partition
    over a tiny frame by construction."""
    from datasette_upload_csvs_spark.operators.mixing import unimax_allocate

    d = load(spark, sf_dir, "documents")
    t = d.groupBy("source").agg(
        F.sum(F.size(_text_tokens(F.col("text")))).cast("bigint").alias("c")
    )
    return unimax_allocate(
        t, budget_num=7, budget_den=5.0, epochs_num=3, epochs_den=2.0
    )


@q(
    "data_constrained_epochs",
    f"""
    WITH toks AS (
      SELECT source,
             len(list_filter(string_split_regex(text, '{SPLIT_RE}'),
                             x -> x <> '')) AS n
      FROM documents
    ), s AS (
      SELECT source, CAST(SUM(n) AS BIGINT) AS unique_tokens
      FROM toks GROUP BY source
    ), t AS (
      SELECT SUM(unique_tokens) AS tt, COUNT(*) AS ns FROM s
    ), alloc AS (
      SELECT source, unique_tokens,
             4.0 * tt / ns AS budget_tokens,
             greatest(4.0 * tt / ns / unique_tokens - 1.0, 0.0)
               AS repeat_epochs
      FROM s, t
    ), eff AS (
      SELECT source, unique_tokens, budget_tokens, repeat_epochs,
             unique_tokens
               + unique_tokens * 15.4
                 * (1 - exp(-repeat_epochs / 15.4)) AS effective_tokens
      FROM alloc
    )
    SELECT source, unique_tokens,
           round(repeat_epochs, 6) AS repeat_epochs,
           round(effective_tokens, 6) AS effective_tokens,
           round(effective_tokens / budget_tokens, 6)
             AS budget_efficiency
    FROM eff
    """,
)
def data_constrained_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained scaling allocation (Muennighoff et al.
    NeurIPS '23): when the token budget exceeds a source's unique
    data, the source is repeated for R epochs, but repeated tokens
    decay in value — the paper fits effective data
    D' = U + U·R*·(1 − e^(−R/R*)) with R* ≈ 15.4 (their Eq. 5's
    half-life form). This entry gives every source an equal share of
    a 4× total-token budget and reports how many repeat epochs that
    implies and what the repeats are WORTH in effective unique
    tokens — small sources show deep repetition with sharply
    diminishing budget_efficiency, large sources stay near 1 epoch
    at full value; the table is the input a budget re-balancer
    (unimax_source_mix) consumes.

    Scale shape: ONE corpus scan partial-aggregated to a
    |sources|-row frame; every formula term is closed-form column
    arithmetic on that tiny frame joined to a broadcast 1-row total.
    All inputs to the exp/round are doubles derived from exact
    integer counts, so both engines branch and round identically."""
    d = load(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.sum(F.size(_text_tokens(F.col("text"))))
        .cast("bigint")
        .alias("unique_tokens")
    )
    t = s.agg(
        F.sum("unique_tokens").alias("tt"), F.count("*").alias("ns")
    )
    budget = F.lit(4.0) * F.col("tt") / F.col("ns")
    epochs = F.greatest(
        budget / F.col("unique_tokens") - F.lit(1.0), F.lit(0.0)
    )
    eff = F.col("unique_tokens") + F.col("unique_tokens") * F.lit(15.4) * (
        F.lit(1.0) - F.exp(-F.col("_re") / F.lit(15.4))
    )
    return (
        s.join(F.broadcast(t))
        .withColumn("_bt", budget)
        .withColumn("_re", epochs)
        .withColumn("_eff", eff)
        .select(
            "source",
            "unique_tokens",
            F.round("_re", 6).alias("repeat_epochs"),
            F.round("_eff", 6).alias("effective_tokens"),
            F.round(F.col("_eff") / F.col("_bt"), 6).alias(
                "budget_efficiency"
            ),
        )
    )


@q(
    "perplexity_band_filter",
    f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                x -> x <> '')) AS w
      FROM documents
    ), freq AS (
      SELECT w, COUNT(*) AS cnt FROM toks GROUP BY w
    ), tot AS (SELECT SUM(cnt) AS tot FROM freq),
    scored AS (
      SELECT w, CAST(round(-ln(cnt / tot), 10) AS DECIMAL(28,12)) AS nll
      FROM freq, tot
    ), doc_nll AS (
      SELECT doc_id, round(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS avg_nll
      FROM toks JOIN scored USING (w)
      GROUP BY doc_id
    ), j AS (
      SELECT d.doc_id, d.source, n.avg_nll
      FROM documents d JOIN doc_nll n USING (doc_id)
    ), r AS (
      SELECT doc_id, source, avg_nll,
             row_number() OVER (PARTITION BY source
                                ORDER BY avg_nll, doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY source) AS cnt
      FROM j
    )
    SELECT doc_id, source, avg_nll,
           CAST((4 * (rk - 1)) // cnt AS INTEGER) AS quartile,
           (4 * (rk - 1)) // cnt IN (1, 2) AS kept
    FROM r
    """,
)
def perplexity_band_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mid-perplexity pruning (Marion et al. '23, "When Less is
    More"): their strongest result keeps the MIDDLE of the per-domain
    perplexity distribution — the lowest-perplexity band is
    boilerplate/templated text, the highest is noise, and training on
    the middle band beats training on everything. Every document gets
    its corpus-LM score (the KenLM stand-in ccnet_perplexity_buckets
    uses), a per-SOURCE quartile, and a kept flag for the middle two
    quartiles.

    The quartile is rank-based exact integer math ((4·(rank−1)) div
    count), not an interpolated percentile. The within-source rank
    uses the repo's two-phase distributed rank (row_number within
    (source, coarse nll band) + band-count prefix sums) rather than
    one window per source — |sources| giant partitions is exactly the
    skew a 100 TB corpus cannot afford; the two-phase form is
    identical to the oracle's single window by construction (the band
    is a prefix of the sort key)."""
    docs = load(spark, sf_dir, "documents")
    nll = textstats.unigram_logprob(docs).select("doc_id", "avg_nll")
    j = docs.select("doc_id", "source").join(nll, "doc_id")
    banded = j.withColumn(
        "_band", F.floor(F.col("avg_nll") * 4).cast("bigint")
    )
    w_in = Window.partitionBy("source", "_band").orderBy(
        "avg_nll", "doc_id"
    )
    within = banded.withColumn("_rn", F.row_number().over(w_in))
    band_counts = banded.groupBy("source", "_band").agg(
        F.count("*").alias("_bc")
    )
    w_pre = (
        Window.partitionBy("source")
        .orderBy("_band")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefixes = band_counts.select(
        "source",
        "_band",
        F.coalesce(F.sum("_bc").over(w_pre), F.lit(0)).alias("_pre"),
    )
    src_counts = j.groupBy("source").agg(F.count("*").alias("cnt"))
    ranked = (
        within.join(F.broadcast(prefixes), ["source", "_band"])
        .join(F.broadcast(src_counts), "source")
        .withColumn("rk", F.col("_pre") + F.col("_rn"))
    )
    quartile = F.expr("(4 * (rk - 1)) div cnt")
    return ranked.select(
        "doc_id",
        "source",
        "avg_nll",
        quartile.cast("int").alias("quartile"),
        quartile.isin(1, 2).alias("kept"),
    )


# ====================================================================
# SoftDedup commonness reweighting (He et al. ACL '24)
# ====================================================================


@q(
    "softdedup_commonness_weights",
    f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                 x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS g
      FROM toks, UNNEST(range(1, greatest(len(t) - 6, 2))) AS u(i)
    ), dfs AS (
      SELECT g, COUNT(*) AS df FROM sh GROUP BY g
    )
    SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
           round(1.0 * SUM(dfs.df) / COUNT(*), 6) AS mean_gram_df,
           round(1.0 * COUNT(*) / SUM(dfs.df), 6) AS weight
    FROM sh s JOIN dfs USING (g)
    GROUP BY s.doc_id
    """,
)
def softdedup_commonness_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SoftDedup (He et al. ACL '24): instead of DELETING near-dups,
    down-weight every document by its "data commonness" so common
    text contributes proportionally less training signal — here
    commonness = mean corpus document-frequency of the doc's
    distinct 8-gram fingerprints, weight = 1/commonness (a fully
    unique doc gets weight 1.0; a doc whose grams all appear in k
    docs gets ~1/k). The soft complement to the hard removal list of
    decontaminate_exact_ngram / dedup_groups.

    Grams are the hashed-window fingerprints of _hashed_gram_rows
    (never materialized as strings; the oracle agrees on gram
    EQUALITY, not values). mean_gram_df = SUM(df)/COUNT on exact
    int64s — both engines divide identical integers.

    Scale shape: the canonical TF-IDF-shaped plan — one gram-keyed
    aggregation for df, one gram-keyed join back, one doc-keyed
    aggregation (three exchanges, each partial-aggregated map-side;
    AQE's skew-join split handles boilerplate-gram hot keys). No
    per-doc state, no driver loop."""
    # 8-gram hashing is per-row CPU in the scan stage: spread
    # under-parallel inputs (r14; see dedup._spread)
    d = dedup._spread(load(spark, sf_dir, "documents"), "doc_id")
    sh = _hashed_gram_rows(d, 8, ["doc_id"])
    dfs = sh.groupBy("g").agg(F.count("*").alias("df"))
    return (
        sh.join(dfs, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("df").alias("_sum_df"),
        )
        .select(
            "doc_id",
            "n_grams",
            F.round(
                F.col("_sum_df").cast("double") / F.col("n_grams"), 6
            ).alias("mean_gram_df"),
            F.round(
                F.col("n_grams").cast("double") / F.col("_sum_df"), 6
            ).alias("weight"),
        )
    )


# ====================================================================
# tokenizer fertility diagnostics
# ====================================================================


@q(
    "tokenizer_fertility_by_lang",
    f"""
    WITH t AS (
      SELECT lang,
             len(list_filter(string_split_regex(text, '{SPLIT_RE}'),
                             x -> x <> '')) AS n_tok,
             LENGTH(text) AS n_chr
      FROM documents
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chr) AS BIGINT) AS n_chars,
           round(1.0 * SUM(n_chr) / SUM(n_tok), 6) AS chars_per_token,
           round(1.0 * SUM(n_tok) / COUNT(*), 6) AS tokens_per_doc
    FROM t GROUP BY lang
    """,
)
def tokenizer_fertility_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer fertility audit by language: chars-per-token (the
    compression a byte-level tokenizer must beat) and tokens-per-doc
    per language — the table a tokenizer-budget decision (vocab
    size, per-language byte premium) reads first. Exact-integer
    ratios, identical in both engines.

    Scale shape: map-only projection into one partial-aggregated
    groupBy on a tiny key (languages) — a single reduce of
    |langs| rows."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        F.size(_text_tokens(F.col("text"))).alias("n_tok"),
        F.length("text").alias("n_chr"),
    )
    return t.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        F.sum("n_chr").cast("bigint").alias("n_chars"),
        F.round(
            F.sum("n_chr").cast("double") / F.sum("n_tok"), 6
        ).alias("chars_per_token"),
        F.round(
            F.sum("n_tok").cast("double") / F.count("*"), 6
        ).alias("tokens_per_doc"),
    )


# ====================================================================
# corpus statistics: Zipf fit and n-gram diversity
# ====================================================================


@q(
    "zipf_slope_by_source",
    f"""
    WITH w AS (
      SELECT source, tok AS word, COUNT(*) AS freq
      FROM (SELECT source,
                   unnest(list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                      x -> x <> '')) AS tok
            FROM documents)
      GROUP BY 1, 2
    ), r AS (
      SELECT source, freq,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY freq DESC, word) AS rnk
      FROM w
    ), xy AS (
      SELECT source, ln(rnk) AS x, ln(freq) AS y FROM r WHERE rnk <= 500
    ), s AS (
      SELECT source, COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(28,14))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(28,14))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(28,14))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(28,14))) AS DOUBLE) AS sxx
      FROM xy GROUP BY source
    )
    SELECT source, CAST(n AS BIGINT) AS n_ranks,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n,
                 6) AS zipf_intercept
    FROM s
    """,
)
def zipf_slope_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit per source: OLS slope of ln(freq) on
    ln(rank) over the top-500 word ranks (ties broken by word for a
    deterministic ranking). Natural text sits near slope −1; a slope
    far from it flags templated/boilerplate or truncated-vocabulary
    sources — a standard corpus-health probe on dataset cards.

    Scale shape: one explode → (source, word) hash aggregate carries
    all corpus-sized work; the rank window runs per source over its
    vocabulary only, and the regression is closed-form from four
    decimal-exact sums over ≤500 rows per source (no ML fit, no
    second corpus pass). Sums are decimal(28,14)-exact so the slope
    is independent of partition order."""
    d = load(spark, sf_dir, "documents")
    w = (
        d.select("source", F.explode(_text_tokens("text")).alias("word"))
        .groupBy("source", "word")
        .agg(F.count("*").alias("freq"))
    )
    r = w.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("source").orderBy(
                F.col("freq").desc(), F.col("word")
            )
        ),
    ).filter(F.col("rnk") <= 500)
    xy = r.select(
        "source",
        F.log(F.col("rnk").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )

    def dsum(c):
        return F.sum(c.cast("decimal(28,14)")).cast("double")

    s = xy.groupBy("source").agg(
        F.count("*").alias("n"),
        dsum(F.col("x")).alias("sx"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "source",
        F.col("n").cast("bigint").alias("n_ranks"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "zipf_intercept"
        ),
    )


@q(
    "ngram_diversity_by_source",
    f"""
    WITH t AS (
      SELECT source,
             list_filter(string_split_regex(text, '{SPLIT_RE}'),
                         x -> x <> '') AS tok
      FROM documents
    ), g AS (
      SELECT source, n,
             unnest(list_transform(
               range(1, greatest(len(tok) - n + 1, 0) + 1),
               i -> array_to_string(list_slice(tok, i, i + n - 1), ' ')
             )) AS gram
      FROM t, UNNEST([1, 2, 3]) AS u(n)
    )
    SELECT source, CAST(n AS INTEGER) AS n,
           CAST(COUNT(*) AS BIGINT) AS total_ngrams,
           CAST(COUNT(DISTINCT gram) AS BIGINT) AS distinct_ngrams,
           round(1.0 * COUNT(DISTINCT gram) / COUNT(*), 6) AS ttr
    FROM g GROUP BY source, n
    """,
)
def ngram_diversity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram type/token ratio per source for n=1,2,3 — the
    distinct-over-total diversity measure (a falling TTR at higher n
    exposes templated or machine-generated sources whose unigram
    stats look healthy). Complements curation_repetition_stats
    (within-doc repetition) with the cross-corpus view.

    Scale shape: every n-gram is built inside codegen from the token
    array (sequence + slice + array_join, no self-join), exploded
    once, then one hash aggregate per (source, n) with map-side
    partials; COUNT(DISTINCT) expands to the standard two-phase
    distinct aggregate. No stage touches the corpus twice."""
    # the triple-n gram build (sequence/slice/array_join per token
    # window) is scan-stage CPU: spread under-parallel inputs (r14;
    # see dedup._spread)
    d = dedup._spread(load(spark, sf_dir, "documents"), "doc_id")
    t = d.select("source", _text_tokens("text").alias("tok"))
    g = (
        t.select(
            "source", "tok", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("n")
        )
        .select(
            "source",
            "n",
            F.explode(
                F.when(
                    F.size("tok") >= F.col("n"),
                    F.transform(
                        F.sequence(F.lit(1), F.size("tok") - F.col("n") + 1),
                        lambda i: F.array_join(
                            F.slice(F.col("tok"), i, F.col("n")), " "
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("gram"),
        )
    )
    return g.groupBy("source", "n").agg(
        F.count("*").cast("bigint").alias("total_ngrams"),
        F.count_distinct("gram").cast("bigint").alias("distinct_ngrams"),
        F.round(F.count_distinct("gram") / F.count("*"), 6).alias("ttr"),
    )


# ====================================================================
# distributed linear algebra: Lloyd step and power iteration
# ====================================================================


# Shared by kmeans_lloyd_step and kmeans_lloyd_step_arrow — same
# one-oracle-two-paths arrangement as _SEMDEDUP_PRUNE_SQL.
_KMEANS_LLOYD_SQL = """
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), init AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
             v AS c
      FROM (SELECT vec_id, v FROM v ORDER BY vec_id LIMIT 8)
    ), d AS (
      SELECT vec_id, v.v AS v, cid,
             list_sum(list_transform(range(1, len(v.v) + 1),
                                     i -> (v.v[i] - c[i]) * (v.v[i] - c[i])))
               AS d2
      FROM v, init
    ), a AS (
      SELECT vec_id, v, cid, d2,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      FROM d
    ), asg AS (SELECT vec_id, v, cid, d2 FROM a WHERE rn = 1),
    pos AS (
      SELECT cid, i AS pos, v[i] AS x
      FROM asg, UNNEST(range(1, len(v) + 1)) AS u(i)
    ), cent AS (
      SELECT cid, pos,
             CAST(SUM(CAST(x AS DECIMAL(28,14))) AS DOUBLE) / COUNT(*) AS m
      FROM pos GROUP BY cid, pos
    ), norm AS (
      SELECT cid,
             sqrt(CAST(SUM(CAST(m * m AS DECIMAL(28,14))) AS DOUBLE))
               AS cnorm
      FROM cent GROUP BY cid
    ), stats AS (
      SELECT cid, COUNT(*) AS n_members,
             CAST(SUM(CAST(d2 AS DECIMAL(28,14))) AS DOUBLE) AS inertia
      FROM asg GROUP BY cid
    )
    SELECT s.cid AS cluster_id, CAST(s.n_members AS BIGINT) AS n_members,
           round(s.inertia, 6) AS inertia,
           round(n.cnorm, 6) AS new_centroid_norm
    FROM stats s JOIN norm n ON s.cid = n.cid
    """


@q("kmeans_lloyd_step", _KMEANS_LLOYD_SQL)
def kmeans_lloyd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One distributed Lloyd iteration of k-means (k=8, centroids
    seeded from the 8 lowest vec_ids): assign every vector to its
    nearest centroid by squared L2 (ties to the lower cluster id),
    then recompute per-cluster size, inertia, and the updated
    centroid's norm. A full k-means run is this step in a loop — each
    iteration is the same two aggregates, so the entry is the unit of
    work a driver-side loop repeats until the inertia delta floors.

    Scale shape: the k×dim centroid table is broadcast (a few KB);
    assignment is a map-only nested-loop against the broadcast with
    the distance folded as a JVM expression (zip_with + aggregate evaluates
    positionally, so the doubles are bit-identical across engines and
    the argmin needs no tolerance). The recompute is ONE
    (cluster, pos) hash aggregate with decimal-exact sums that also
    carries the cluster-level member count and inertia (identical
    across a cluster's positions, read back with max()), so the
    corpus is scanned exactly once — the plan a 1000-executor
    MLlib-free k-means actually wants. No collect; the argmin is a
    per-vector window over k=8 rows that Spark folds into a
    pre-shuffle WindowGroupLimit."""
    if _vector_backend() == "arrow":
        return _kmeans_lloyd_step_arrow_impl(spark, sf_dir)
    from datasette_upload_csvs_spark.operators import kmeans

    e = load(spark, sf_dir, "embeddings")
    v = e.select("vec_id", as_double_array(F.col("embedding")).alias("v"))
    init = kmeans.seed_centroids(v, 8)
    asg = kmeans.assign(v, init)
    # Single corpus pass — see operators/kmeans.py:cent_pos_agg; the
    # full driver loop (lloyd) repeats exactly this step.
    return _lloyd_step_rollup(kmeans.cent_pos_agg(asg))


def _lloyd_step_rollup(cent: DataFrame) -> DataFrame:
    """The (cid, pos)-aggregate → per-cluster stats rollup shared by
    kmeans_lloyd_step and its Arrow twin: member count and inertia
    ride the aggregate (identical across a cluster's positions, read
    back with max()), the new centroid norm is a decimal-exact sum of
    squared means."""
    return cent.groupBy("cid").agg(
        F.max("cnt").cast("bigint").alias("n_members"),
        F.round(F.max("sd2").cast("double"), 6).alias("inertia"),
        F.round(
            F.sqrt(
                F.sum((F.col("m") * F.col("m")).cast("decimal(28,14)")).cast(
                    "double"
                )
            ),
            6,
        ).alias("new_centroid_norm"),
    ).select(
        F.col("cid").alias("cluster_id"),
        "n_members",
        "inertia",
        "new_centroid_norm",
    )


def _kmeans_lloyd_step_arrow_impl(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Lloyd step with the ASSIGNMENT on the Arrow matmul path
    (similarity_arrow.assign_sqdist_arrow) and the recompute on the
    same decimal-exact JVM aggregate as the expression entry. The
    Arrow stage picks each vector's centroid; d2 is then re-derived
    with the positional JVM fold against the chosen centroid
    (broadcast join on cid), so inertia sums are bit-identical to the
    oracle — the argmin is the only thing the fast path decides, and
    the fixtures pin it equal to the expression argmin
    (tests/test_vector_backend.py)."""
    from datasette_upload_csvs_spark.operators import kmeans
    from datasette_upload_csvs_spark.operators.similarity_arrow import (
        assign_sqdist_arrow,
    )

    e = load(spark, sf_dir, "embeddings")
    v = e.select("vec_id", as_double_array(F.col("embedding")).alias("v"))
    init = kmeans.seed_centroids(v, 8)
    asg = (
        assign_sqdist_arrow(v, init)
        .select("vec_id", "v", "cid")  # drop the fp-expanded d2
        .join(F.broadcast(init), "cid")
        .select(
            "vec_id", "v", "cid", kmeans._sqdist("v", "c").alias("d2")
        )
    )
    return _lloyd_step_rollup(kmeans.cent_pos_agg(asg))


@q("kmeans_lloyd_step_arrow", _KMEANS_LLOYD_SQL)
def kmeans_lloyd_step_arrow_entry(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Production Lloyd iteration as a first-class registry entry —
    Arrow-matmul assignment + the expression entry's decimal-exact
    recompute, against kmeans_lloyd_step's oracle verbatim (see
    _kmeans_lloyd_step_arrow_impl for why the outputs are
    bit-identical)."""
    return _kmeans_lloyd_step_arrow_impl(spark, sf_dir)


@q(
    "embedding_pca_power_iteration",
    """
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), dim AS (SELECT len(v) AS d FROM v LIMIT 1),
    dots AS (
      SELECT vec_id, v, list_sum(v) / sqrt(d) AS dot FROM v, dim
    ), pos AS (
      SELECT i AS pos, v[i] * dot AS contrib
      FROM dots, UNNEST(range(1, len(v) + 1)) AS u(i)
    ), w AS (
      SELECT pos,
             CAST(SUM(CAST(contrib AS DECIMAL(28,14))) AS DOUBLE) AS w
      FROM pos GROUP BY pos
    ), lam AS (
      SELECT sqrt(CAST(SUM(CAST(w * w AS DECIMAL(28,14))) AS DOUBLE)) AS l
      FROM w
    )
    SELECT CAST(pos AS INTEGER) AS pos,
           round(w / l, 6) AS loading,
           round(l, 6) AS gram_norm
    FROM w, lam
    """,
)
def embedding_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One power-iteration step toward the corpus's dominant
    embedding direction (Mu & Viswanath '18 all-but-the-top: the
    common direction every embedding shares, removed before cosine
    retrieval): v1 = X'Xv0 / |X'Xv0| with v0 = 1/sqrt(dim). Returns
    the per-dimension loading of v1 plus |X'Xv0| (the unnormalized
    Rayleigh-step norm). A full power iteration repeats this step —
    each pass is the same pair of aggregates with v0 re-broadcast;
    the loop (plus the ABTT projection that consumes the direction)
    lives in operators/linalg.py, and tests pin this entry equal to
    its iteration one.

    Scale shape: X'Xv0 without materializing the gram matrix — the
    per-vector dot x·v0 folds as a JVM expression (positional, bit-identical
    across engines), then ONE (pos) hash aggregate sums x * dot with
    decimal-exact accumulation; dim rows out. Corpus is read once,
    shuffled never (the aggregate key is the 64-value dimension
    index, map-side combined)."""
    e = load(spark, sf_dir, "embeddings")
    v = e.select("vec_id", as_double_array(F.col("embedding")).alias("v"))
    dots = v.select(
        "v",
        (
            F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x)
            / F.sqrt(F.size("v").cast("double"))
        ).alias("dot"),
    )
    pos = dots.select(F.posexplode("v").alias("pos0", "x"), "dot").select(
        (F.col("pos0") + 1).alias("pos"), (F.col("x") * F.col("dot")).alias("contrib")
    )
    # w is dim rows; checkpoint it so the norm branch below reuses
    # the one corpus aggregate instead of re-deriving the whole scan
    # (same contract as the other small multi-consumer aggregates —
    # see queries() docstring).
    w = pos.groupBy("pos").agg(
        F.sum(F.col("contrib").cast("decimal(28,14)")).cast("double").alias("w")
    ).localCheckpoint(eager=False)
    lam = w.agg(
        F.sqrt(
            F.sum((F.col("w") * F.col("w")).cast("decimal(28,14)")).cast("double")
        ).alias("l")
    )
    return w.crossJoin(F.broadcast(lam)).select(
        F.col("pos").cast("int").alias("pos"),
        F.round(F.col("w") / F.col("l"), 6).alias("loading"),
        F.round("l", 6).alias("gram_norm"),
    )


@q(
    "unigram_kl_by_source",
    f"""
    WITH tok AS (
      SELECT source,
             unnest(list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                x -> x <> '')) AS word
      FROM documents
    ), cnt AS (
      SELECT source, word, COUNT(*) AS c FROM tok GROUP BY 1, 2
    ), corpus AS (
      SELECT word, SUM(c) AS cc FROM cnt GROUP BY 1
    ), vstats AS (
      SELECT COUNT(*) AS v, SUM(cc) AS nc FROM corpus
    ), tot AS (
      SELECT source, SUM(c) AS ns FROM cnt GROUP BY 1
    ), grid AS (
      SELECT t.source, w.word, w.cc, t.ns, s.v, s.nc
      FROM tot t, corpus w, vstats s
    ), j AS (
      SELECT g.source, g.ns, g.v, g.nc,
             (COALESCE(c.c, 0) + 1.0) / (g.ns + g.v) AS ps,
             (g.cc + 1.0) / (g.nc + g.v) AS pc
      FROM grid g LEFT JOIN cnt c
        ON g.source = c.source AND g.word = c.word
    )
    SELECT source,
           CAST(MAX(v) AS BIGINT) AS vocab_size,
           CAST(MAX(ns) AS BIGINT) AS n_tokens,
           round(CAST(SUM(CAST(ps * ln(ps / pc) AS DECIMAL(28,14)))
                      AS DOUBLE), 6) AS kl_to_corpus
    FROM j GROUP BY source
    """,
)
def unigram_kl_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-shift probe: KL divergence of each source's add-one-
    smoothed unigram distribution from the corpus-wide distribution
    (the screen a data-mixing decision reads before re-weighting —
    a source with high KL is the one temperature mixing up- or
    down-weights). Smoothing puts both distributions on the shared
    corpus vocabulary so absent words contribute their smoothed mass.

    Scale shape: one explode feeds a (source, word) hash aggregate;
    everything after runs on vocabulary-sized data — the corpus
    totals row is broadcast, the |sources|×|vocab| grid is built from
    two small frames (never from the corpus), and the per-source KL
    is a decimal-exact sum so partition order cannot move the
    result."""
    d = load(spark, sf_dir, "documents")
    # cnt is vocabulary-sized (|sources| x |vocab|) but feeds FOUR
    # consumers (source totals, corpus counts, vocab stats, the
    # smoothing join) — checkpoint it so the corpus explode+aggregate
    # runs once instead of once per consumer.
    cnt = (
        d.select("source", F.explode(_text_tokens("text")).alias("word"))
        .groupBy("source", "word")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    corpus = cnt.groupBy("word").agg(F.sum("c").alias("cc"))
    vstats = corpus.agg(
        F.count("*").alias("v"), F.sum("cc").alias("nc")
    )
    tot = cnt.groupBy("source").agg(F.sum("c").alias("ns"))
    grid = tot.crossJoin(corpus).crossJoin(F.broadcast(vstats))
    j = grid.join(cnt, ["source", "word"], "left").select(
        "source",
        "ns",
        "v",
        ((F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0)) / (F.col("ns") + F.col("v"))).alias("ps"),
        ((F.col("cc") + F.lit(1.0)) / (F.col("nc") + F.col("v"))).alias("pc"),
    )
    return j.groupBy("source").agg(
        F.max("v").cast("bigint").alias("vocab_size"),
        F.max("ns").cast("bigint").alias("n_tokens"),
        F.round(
            F.sum(
                (F.col("ps") * F.log(F.col("ps") / F.col("pc"))).cast(
                    "decimal(28,14)"
                )
            ).cast("double"),
            6,
        ).alias("kl_to_corpus"),
    )


@q(
    "semantic_decontamination",
    """
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), b AS (
      SELECT vec_id AS bid, v AS bv FROM v ORDER BY vec_id LIMIT 16
    ), s AS (
      SELECT vec_id, label,
             MAX(list_sum(list_transform(range(1, len(v) + 1),
                                          i -> v[i] * bv[i]))
                 / (sqrt(list_sum(list_transform(range(1, len(v) + 1),
                                                 i -> v[i] * v[i])))
                    * sqrt(list_sum(list_transform(range(1, len(bv) + 1),
                                                   i -> bv[i] * bv[i])))))
               AS max_sim
      FROM v, b
      WHERE vec_id NOT IN (SELECT bid FROM b)
      GROUP BY vec_id, label
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(count_if(max_sim >= 0.35) AS BIGINT) AS n_flagged,
           round(CAST(SUM(CAST(max_sim AS DECIMAL(28,14))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_max_sim,
           round(MAX(max_sim), 6) AS top_max_sim
    FROM s GROUP BY label
    """,
)
def semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination screen (the semantic
    complement of the exact 8-gram screen in
    decontaminate_exact_ngram): every corpus vector's max cosine
    against a held-out benchmark set (here the 16 lowest vec_ids),
    flagged at 0.35, rolled up per label. The n-gram screen misses
    paraphrased benchmark leakage; this one catches it.

    Scale shape: the benchmark set is broadcast (16×dim, a few KB);
    the scan is map-only — each corpus vector folds 16 cosines in
    a JVM expression (positional zip_with/aggregate, bit-identical doubles in
    both engines, so the >= flag needs no tolerance) and keeps the
    max, then one tiny-key label aggregate. One corpus pass, zero
    shuffles of vector data."""
    if _vector_backend() == "arrow":
        return _semantic_decontamination_arrow_impl(spark, sf_dir)
    e = load(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id", "label", as_double_array(F.col("embedding")).alias("v")
    )
    b = (
        v.orderBy("vec_id")
        .limit(16)
        .select(F.col("vec_id").alias("bid"), F.col("v").alias("bv"))
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda a, c: a * c),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )

    # One broadcast row holding all 16 benchmark vectors: each corpus
    # vector folds its 16 cosines and the max JVM-side — no row
    # blowup, no per-vector exchange; the only shuffle left is the
    # tiny label-keyed rollup.
    bl = b.agg(F.collect_list("bv").alias("bvs"))
    max_sim = F.array_max(
        F.transform(
            "bvs",
            lambda bv: dot(F.col("v"), bv)
            / (F.sqrt(dot(F.col("v"), F.col("v"))) * F.sqrt(dot(bv, bv))),
        )
    )
    s = (
        v.join(F.broadcast(b.select("bid")), v.vec_id == F.col("bid"), "left_anti")
        .crossJoin(F.broadcast(bl))
        .select("vec_id", "label", max_sim.alias("max_sim"))
    )
    return _decontamination_rollup(s)


def _decontamination_rollup(s: DataFrame) -> DataFrame:
    """(label, n_vecs, n_flagged, avg_max_sim, top_max_sim) from the
    per-vector (label, max_sim) frame — shared by both
    semantic_decontamination backends."""
    return s.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_vecs"),
        F.count_if(F.col("max_sim") >= 0.35).cast("bigint").alias("n_flagged"),
        F.round(
            F.sum(F.col("max_sim").cast("decimal(28,14)")).cast("double")
            / F.count("*"),
            6,
        ).alias("avg_max_sim"),
        F.round(F.max("max_sim"), 6).alias("top_max_sim"),
    )


def _semantic_decontamination_arrow_impl(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The decontamination screen's production path: one numpy
    `V @ Q.T` per Arrow batch (operators/similarity_arrow.
    max_cosine_arrow, 99× the interpreted fold at 256 k vectors —
    PLANS_r06.md §5c), labels riding the batch as a passthrough
    column, then the shared label rollup. Scores differ from the
    expression path only in last-ulp summation order;
    tests/test_vector_backend.py pins the rolled-up output equal on
    the fixtures."""
    from datasette_upload_csvs_spark.operators.similarity_arrow import (
        max_cosine_arrow,
    )

    e = load(spark, sf_dir, "embeddings")
    bids = [
        r[0]
        for r in e.orderBy("vec_id").limit(16).select("vec_id").collect()
    ]
    s = max_cosine_arrow(
        e, bids, vec_col="embedding", id_col="vec_id", passthrough=["label"]
    )
    return _decontamination_rollup(s)


@q(
    "bm25_doc_ranking",
    f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                 x -> x <> '') AS t
      FROM documents
    ), stats AS (
      SELECT COUNT(*) AS n, AVG(len(t)) AS avgdl FROM toks
    ), dfreq AS (
      SELECT tok, COUNT(*) AS df
      FROM (SELECT doc_id, unnest(list_distinct(t)) AS tok FROM toks)
      WHERE tok IN ('join', 'scan', 'merge')
      GROUP BY tok
    ), tf AS (
      SELECT doc_id, len(t) AS dl, d.tok,
             len(list_filter(t, x -> x = d.tok)) AS tf
      FROM toks, dfreq d
    ), scored AS (
      SELECT doc_id,
             round(SUM(ln((s.n - f.df + 0.5) / (f.df + 0.5) + 1.0)
                       * (tf.tf * 2.2)
                       / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / s.avgdl))),
                   10) AS score
      FROM tf JOIN dfreq f ON tf.tok = f.tok, stats s
      WHERE tf.tf > 0
      GROUP BY doc_id
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INTEGER)
             AS rank,
           doc_id, round(score, 6) AS bm25
    FROM scored
    QUALIFY rank <= 20
    """,
)
def bm25_doc_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 for the query {join, scan, merge} with the
    standard k1=1.2, b=0.75 — the rank function the reference's
    delegated query surface ships natively (SQLite FTS5's bm25()),
    re-expressed as two aggregates and a top-k. IDF is the
    ln((N-df+0.5)/(df+0.5)+1) form, length normalization against the
    corpus average doc length.

    Scale shape: one corpus scan computes per-doc term frequencies
    with the 3-term query cross-joined from a broadcast df table;
    the (N, avgdl) stats row is broadcast; the final top-20 compiles
    to TakeOrderedAndProject via the rank window over only the
    matching docs. Scores are identical double arithmetic in both
    engines (≤3 summed terms), so the ranking needs no tolerance."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", _text_tokens("text").alias("t"))
    terms = ["join", "scan", "merge"]
    stats = toks.agg(
        F.count("*").alias("n"), F.avg(F.size("t")).alias("avgdl")
    )
    dfreq = (
        toks.select("doc_id", F.explode(F.array_distinct("t")).alias("tok"))
        .filter(F.col("tok").isin(terms))
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
    )
    tf = (
        toks.crossJoin(F.broadcast(dfreq))
        .select(
            "doc_id",
            F.size("t").alias("dl"),
            "tok",
            "df",
            F.size(F.filter("t", lambda x: x == F.col("tok"))).alias("tf"),
        )
        .filter(F.col("tf") > 0)
    )
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    scored = (
        tf.crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(
                    idf
                    * (F.col("tf") * 2.2)
                    / (
                        F.col("tf")
                        + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
                    )
                ),
                10,
            ).alias("score")
        )
    )
    w = Window.orderBy(F.desc("score"), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select(
            F.col("rank").cast("int"),
            "doc_id",
            F.round("score", 6).alias("bm25"),
        )
    )


@q(
    "abtt_cleaned_topk",
    """
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), dim AS (SELECT len(v) AS d FROM v LIMIT 1),
    dots AS (
      SELECT vec_id, v, list_sum(v) / sqrt(d) AS dot FROM v, dim
    ), pos AS (
      SELECT i AS pos, v[i] * dot AS contrib
      FROM dots, UNNEST(range(1, len(v) + 1)) AS u(i)
    ), w AS (
      SELECT pos,
             CAST(SUM(CAST(contrib AS DECIMAL(28,14))) AS DOUBLE) AS w
      FROM pos GROUP BY pos
    ), lam AS (
      SELECT sqrt(CAST(SUM(CAST(w * w AS DECIMAL(28,14))) AS DOUBLE)) AS l
      FROM w
    ), dir AS (
      SELECT list(w / l ORDER BY pos) AS u FROM w, lam GROUP BY l
    ), cleaned AS (
      SELECT vec_id,
             list_transform(range(1, len(v) + 1),
                            i -> v[i] - du * u[i]) AS cv
      FROM (SELECT vec_id, v, u,
                   list_sum(list_transform(range(1, len(v) + 1),
                                           i -> v[i] * u[i])) AS du
            FROM v, dir)
    ), q0 AS (SELECT cv AS qv FROM cleaned WHERE vec_id = 0),
    scored AS (
      SELECT c.vec_id,
             list_sum(list_transform(range(1, len(c.cv) + 1),
                                     i -> c.cv[i] * q.qv[i]))
               / (sqrt(list_sum(list_transform(c.cv, e -> e * e)))
                  * sqrt(list_sum(list_transform(q.qv, e -> e * e)))) AS cs
      FROM cleaned c, q0 q WHERE c.vec_id <> 0
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY cs DESC, vec_id ASC) AS INTEGER)
             AS rank,
           vec_id AS neighbor_id, round(cs, 6) AS cos_sim
    FROM scored
    QUALIFY rank <= 10
    """,
)
def abtt_cleaned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval AFTER all-but-the-top cleanup (Mu & Viswanath '18)
    — the payoff of embedding_pca_power_iteration: estimate the
    dominant common direction (one power step from the uniform
    start), project it out of every vector, then cosine top-10 for
    query 0 in the CLEANED space. Compare similarity_topk_bruteforce
    (the raw-space twin): rankings move exactly where the shared
    direction was drowning the signal.

    Scale shape: the direction is dim values built from one
    dimension-keyed aggregate (decimal-exact, so both engines build
    the identical direction), broadcast back; cleaning is map-only;
    the top-10 compiles to TakeOrderedAndProject. Two corpus passes
    total — one to learn the direction, one to clean-and-score; the
    operators/linalg.py loop amortizes pass one across iterations."""
    e = load(spark, sf_dir, "embeddings")
    v = e.select("vec_id", as_double_array(F.col("embedding")).alias("v"))
    dots = v.select(
        "vec_id",
        "v",
        (
            F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x)
            / F.sqrt(F.size("v").cast("double"))
        ).alias("dot"),
    )
    pos = dots.select(F.posexplode("v").alias("pos", "x"), "dot")
    w = pos.groupBy("pos").agg(
        F.sum((F.col("x") * F.col("dot")).cast("decimal(28,14)"))
        .cast("double")
        .alias("w")
    )
    dirdf = w.agg(
        F.sqrt(
            F.sum((F.col("w") * F.col("w")).cast("decimal(28,14)")).cast(
                "double"
            )
        ).alias("l"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "w"))),
            lambda s: s["w"],
        ).alias("wvec"),
    ).select(F.transform("wvec", lambda x: x / F.col("l")).alias("u"))

    def dot2(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )

    cleaned = (
        v.crossJoin(F.broadcast(dirdf))
        .withColumn("du", dot2(F.col("v"), F.col("u")))
        .select(
            "vec_id",
            F.zip_with(
                "v", "u", lambda a, b: a - F.col("du") * b
            ).alias("cv"),
        )
    )
    q0 = cleaned.filter(F.col("vec_id") == 0).select(
        F.col("cv").alias("qv")
    )
    scored = (
        cleaned.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q0))
        .select(
            "vec_id",
            (
                dot2(F.col("cv"), F.col("qv"))
                / (
                    F.sqrt(dot2(F.col("cv"), F.col("cv")))
                    * F.sqrt(dot2(F.col("qv"), F.col("qv")))
                )
            ).alias("cs"),
        )
    )
    wdw = Window.orderBy(F.col("cs").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(wdw))
        .filter(F.col("rank") <= 10)
        .select(
            F.col("rank").cast("int"),
            F.col("vec_id").alias("neighbor_id"),
            F.round("cs", 6).alias("cos_sim"),
        )
    )


def _ann_recall_stats(base: DataFrame):
    """ONE aggregate over the recall gate's base embeddings yielding
    corpus size ``n``, planted count ``p``, max id ``mx`` AND the
    collapse-gate dup-mass statistic of the corpus the gate will
    actually run on (``base ∪ perturbed twins``): each base row
    contributes the xxhash64 of its own double-cast array, each
    PLANTED row (vec_id % 5 = 0) additionally the hash of its
    perturbed twin — the identical transform/float-cast/double-cast
    expression chain the twin frame uses, so hashed values are
    bit-equal to what the corpus relation carries. nd = n + p,
    ng = ``ngc`` = count_distinct(h) — exactly what
    dedup._dup_mass_stats(double_array_frame(corpus), xxhash64(v))
    returns (pinned by test_ann_gate_fold), without the second
    corpus-wide gate action (r15, VERDICT item 5)."""
    from datasette_upload_csvs_spark.functions.vector import (
        as_double_array,
    )

    twin_vec = F.transform(
        "embedding",
        lambda x, i: x + F.when(i == 0, F.lit(0.001)).otherwise(F.lit(0.0)),
    ).cast("array<float>")
    planted = F.pmod("vec_id", F.lit(5)) == 0
    self_e = F.struct(
        F.lit(1).alias("pri"),
        F.col("vec_id").alias("vid"),
        F.xxhash64(as_double_array(F.col("embedding"))).alias("h"),
    )
    twin_e = F.struct(
        F.lit(0).alias("pri"),
        F.col("vec_id").alias("vid"),
        F.xxhash64(as_double_array(twin_vec)).alias("h"),
    )
    return (
        base.select(
            F.explode(
                F.when(planted, F.array(self_e, twin_e)).otherwise(
                    F.array(self_e)
                )
            ).alias("e")
        )
        .agg(
            F.sum("e.pri").alias("n"),
            F.sum(
                F.when(
                    (F.col("e.pri") == 1)
                    & (F.pmod("e.vid", F.lit(5)) == 0),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("p"),
            F.max(F.when(F.col("e.pri") == 1, F.col("e.vid"))).alias("mx"),
            F.count_distinct("e.h").alias("ngc"),
        )
        .first()
    )


@q(
    "ann_bands_recall",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_planted,
           CAST(COUNT(*) AS BIGINT) AS n_twin_pairs_found,
           TRUE AS all_found
    FROM embeddings WHERE vec_id % 5 = 0
    """,
)
def ann_bands_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall gate for the multi-table LSH band scheme behind
    streaming/ann_stream.py: plant a perturbed twin (cos ≈ 0.9999)
    of every 5th vector, run the banded batch pipeline at τ=0.99,
    and demand EVERY planted pair is found. The band construction is
    deterministic (fixed hyperplanes, fixed data), so the verdict is
    stable; the oracle independently counts the planted set and pins
    found == planted exactly — if the OR-construction ever drops a
    twin, the counts diverge and the row goes red.

    Scale shape: bucketing is map-only per table; candidates join on
    (table, bucket); exact verify touches candidates only — the
    batch-proportional structure the streaming twin appends with."""
    from datasette_upload_csvs_spark.streaming.ann_stream import (
        embedding_ann_batch,
    )

    # localCheckpoint: the gate aggregate below is an unavoidable
    # extra ACTION (it sizes the planted set with no id-contiguity
    # assumption), but it must not cost an extra parquet SCAN — r8
    # ran it straight off the reader and every downstream consumer
    # (base + twins + the 4 band tables) re-read the files too.
    # Checkpointing makes the aggregate's single scan materialize
    # the blocks every later job reads.
    base = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .localCheckpoint(eager=False)
    )
    # ONE aggregate yields corpus size, the planted count, the twin
    # offset AND the collapse gate's dup-mass statistic — no second
    # scan, and no contiguous-0..n-1 id assumption (the old
    # (n+4)//5 closed form silently diverged from the oracle's actual
    # vec_id % 5 = 0 count on non-contiguous or 1-based fixtures).
    # The twin OFFSET still needs ids disjoint from the base range,
    # so it uses max_id+1 instead of assuming n == max_id+1.
    # Gate fold (r15): embedding_ann_batch's exact-dup gate needs
    # (rows, distinct xxhash64(v)) of the CORPUS = base ∪ twins —
    # computable from base alone in the same job (_ann_recall_stats;
    # pinned corpus-statistic-equal by test_ann_gate_fold), one
    # fewer corpus-wide action per invocation.
    st = _ann_recall_stats(base)
    n_planted, off = int(st["p"] or 0), int(st["mx"]) + 1
    twins = base.filter(F.pmod("vec_id", F.lit(5)) == 0).select(
        (F.col("vec_id") + off).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x + F.when(i == 0, F.lit(0.001)).otherwise(F.lit(0.0)),
        ).cast("array<float>").alias("embedding"),
    )
    corpus = base.unionByName(twins)
    pairs = embedding_ann_batch(
        corpus,
        threshold=0.99,
        dup_stats=(int(st["n"] or 0) + n_planted, int(st["ngc"] or 0)),
    )
    twin_pairs = pairs.filter(
        (F.col("id_b") >= off) & (F.col("id_a") == F.col("id_b") - off)
    )
    found = twin_pairs.count()
    return spark.createDataFrame(
        [(n_planted, found, found == n_planted)],
        schema="n_planted bigint, n_twin_pairs_found bigint, all_found boolean",
    )


@q(
    "aqp_sample_estimate",
    """
    WITH s AS (
      SELECT o_totalprice,
             CAST(md5_number_lower(CAST(o_orderkey AS VARCHAR)) AS DOUBLE)
               / 18446744073709551616.0 < 0.1 AS picked
      FROM orders
    ), agg AS (
      SELECT
        CAST(SUM(CAST(o_totalprice AS DECIMAL(28,14)))
             FILTER (picked) AS DOUBLE) / 0.1 AS est_revenue,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(28,14))) AS DOUBLE)
          AS exact_revenue,
        CAST(count_if(picked) AS BIGINT) AS n_sampled,
        CAST(COUNT(*) AS BIGINT) AS n_total
      FROM s
    )
    SELECT round(est_revenue, 2) AS est_revenue,
           round(exact_revenue, 2) AS exact_revenue,
           n_sampled, n_total,
           round(abs(est_revenue - exact_revenue) / exact_revenue, 6)
             AS rel_error,
           abs(est_revenue - exact_revenue) / exact_revenue < 0.05
             AS within_bound
    FROM agg
    """,
)
def aqp_sample_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing (BlinkDB-style): estimate total
    revenue from a deterministic 10 % content-hash sample
    (Horvitz-Thompson: sample sum / rate) and gate the relative
    error at 5 %. The sample predicate is the engine's reproducible
    md5-low-64 verdict (operators/sampling.py), so BOTH engines pick
    the identical rows and the estimate — not just the verdict — is
    hash-equal across engines.

    Scale shape: the exact twin here exists only to measure the
    error; a production AQP run computes ONLY the map-side-filtered
    sample aggregate — 10× less scan work on a 100 TB fact table,
    zero extra shuffles (the sample filter rides the scan). Both
    sums are decimal-exact, so partition order cannot move the
    estimate."""
    from datasette_upload_csvs_spark.operators.sampling import sample_key

    o = load(spark, sf_dir, "orders")
    s = o.select(
        "o_totalprice",
        (sample_key(F.col("o_orderkey")) < 0.1).alias("picked"),
    )
    agg = s.agg(
        (
            F.sum(
                F.when(
                    F.col("picked"),
                    F.col("o_totalprice").cast("decimal(28,14)"),
                )
            ).cast("double")
            / 0.1
        ).alias("est_revenue"),
        F.sum(F.col("o_totalprice").cast("decimal(28,14)"))
        .cast("double")
        .alias("exact_revenue"),
        F.count_if(F.col("picked")).cast("bigint").alias("n_sampled"),
        F.count("*").cast("bigint").alias("n_total"),
    )
    rel = F.abs(F.col("est_revenue") - F.col("exact_revenue")) / F.col(
        "exact_revenue"
    )
    return agg.select(
        F.round("est_revenue", 2).alias("est_revenue"),
        F.round("exact_revenue", 2).alias("exact_revenue"),
        "n_sampled",
        "n_total",
        F.round(rel, 6).alias("rel_error"),
        (rel < 0.05).alias("within_bound"),
    )


@q(
    "aqp_groupwise_ci",
    """
    WITH s AS (
      SELECT l_returnflag, l_extendedprice AS x
      FROM lineitem
      WHERE CAST(md5_number_lower(CAST(l_orderkey AS VARCHAR) || '-' ||
                                  CAST(l_linenumber AS VARCHAR)) AS DOUBLE)
            / 18446744073709551616.0 < 0.2
    ), g AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(28,14))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(x * x AS DECIMAL(28,14))) AS DOUBLE) AS sxx
      FROM s GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round(sx / n, 6) AS mean_est,
           round(1.96 * sqrt(((sxx - sx * sx / n) / (n - 1)) / n), 6)
             AS ci_halfwidth
    FROM g
    """,
)
def aqp_groupwise_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group online-aggregation estimate (the BlinkDB/OLA
    group-wise form): mean extended price per return flag from a
    deterministic 20 % sample, with the 95 % normal-approximation
    confidence half-width from the sample variance. Complements
    aqp_sample_estimate (global sum) with the per-group accuracy
    readout an interactive dashboard needs before trusting a sample.

    Scale shape: the sample predicate rides the scan (map-side
    filter), one hash aggregate on the tiny flag key; variance from
    decimal-exact Σx/Σx² so the CI is partition-order independent
    and hash-equal across engines."""
    from datasette_upload_csvs_spark.operators.sampling import sample_key

    li = load(spark, sf_dir, "lineitem")
    s = li.filter(
        sample_key(
            F.concat_ws(
                "-",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
            )
        )
        < 0.2
    ).select("l_returnflag", F.col("l_extendedprice").alias("x"))
    g = s.groupBy("l_returnflag").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("x").cast("decimal(28,14)")).cast("double").alias("sx"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(28,14)"))
        .cast("double")
        .alias("sxx"),
    )
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (
        F.col("n") - 1
    )
    return g.select(
        "l_returnflag",
        "n",
        F.round(F.col("sx") / F.col("n"), 6).alias("mean_est"),
        F.round(1.96 * F.sqrt(var / F.col("n")), 6).alias("ci_halfwidth"),
    )


@q(
    "k_anonymity_audit",
    """
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS grp_size
      FROM customer GROUP BY 1, 2
    ), t AS (SELECT COUNT(*) AS n_groups FROM g)
    SELECT c_nationkey, c_mktsegment,
           CAST(grp_size AS BIGINT) AS grp_size,
           CAST((SELECT n_groups FROM t) AS BIGINT) AS n_groups_total
    FROM g WHERE grp_size < 10
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-governance audit: quasi-identifier combinations
    (nation × market segment) whose group size is below k=10 — the
    rows a k-anonymity release policy must generalize or suppress
    (Sweeney '02). The other half of the privacy toolkit next to
    curation_pii_redact (direct-identifier scrubbing): PII redaction
    removes what a row SAYS, k-anonymity flags what a row's COMPANY
    reveals.

    Scale shape: one hash aggregate on the quasi-identifier key and
    a broadcast scalar for the total-group count; the violating set
    is by definition small (< k rows per returned group)."""
    c = load(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("grp_size")
    )
    total = g.agg(F.count("*").alias("n_groups_total"))
    return (
        g.filter(F.col("grp_size") < 10)
        .crossJoin(F.broadcast(total))
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.col("grp_size").cast("bigint").alias("grp_size"),
            F.col("n_groups_total").cast("bigint").alias("n_groups_total"),
        )
    )


@q(
    "doremi_domain_reweight",
    f"""
    WITH tok AS (
      SELECT source,
             unnest(list_filter(string_split_regex(text, '{SPLIT_RE}'),
                                x -> x <> '')) AS word
      FROM documents
    ), cnt AS (
      SELECT source, word, COUNT(*) AS c FROM tok GROUP BY 1, 2
    ), corpus AS (
      SELECT word, SUM(c) AS cc FROM cnt GROUP BY 1
    ), vstats AS (
      SELECT COUNT(*) AS v, SUM(cc) AS nc FROM corpus
    ), tot AS (
      SELECT source, SUM(c) AS ns FROM cnt GROUP BY 1
    ), grid AS (
      SELECT t.source, w.word, w.cc, t.ns, s.v, s.nc
      FROM tot t, corpus w, vstats s
    ), j AS (
      SELECT g.source, g.ns, g.nc,
             (COALESCE(c.c, 0) + 1.0) / (g.ns + g.v) AS ps,
             (g.cc + 1.0) / (g.nc + g.v) AS pc
      FROM grid g LEFT JOIN cnt c
        ON g.source = c.source AND g.word = c.word
    ), kl AS (
      SELECT source, MAX(ns) AS ns, MAX(nc) AS nc,
             round(CAST(SUM(CAST(ps * ln(ps / pc) AS DECIMAL(28,14)))
                        AS DOUBLE), 6) AS excess
      FROM j GROUP BY source
    ), upd AS (
      SELECT source, ns, excess,
             1.0 * ns / nc AS alpha0,
             (1.0 * ns / nc) * exp(excess) AS alpha_up,
             COUNT(*) OVER () AS k,
             CAST(SUM(CAST((1.0 * ns / nc) * exp(excess)
                           AS DECIMAL(28,18))) OVER () AS DOUBLE) AS zz
      FROM kl
    )
    SELECT source,
           CAST(ns AS BIGINT) AS n_tokens,
           round(alpha0, 6) AS baseline_weight,
           excess AS excess_loss,
           round(0.999 * alpha_up / zz + 0.001 / k, 6) AS domain_weight,
           round((0.999 * alpha_up / zz + 0.001 / k) / alpha0, 6)
             AS reweight_ratio
    FROM upd
    """,
)
def doremi_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One DoReMi Group-DRO domain-reweighting step (Xie et al.
    NeurIPS '23, Algorithm 1): w'_i ∝ w_i · exp(η·λ_i) with the
    paper's η = 1, then the c = 1e-3 uniform smoothing
    α_i = (1−c)·w'_i/Z + c/k. Baseline weights w_i are the token
    shares (the paper's initialization); the per-domain excess loss
    λ_i = max(0, L_proxy,i − L_ref,i) is stood in by the source's
    unigram KL to the corpus — EXACTLY the expected NLL gap between
    scoring the source under the corpus LM vs its own LM
    (E_src[−ln p_corpus] − E_src[−ln p_src] = KL(src‖corpus) ≥ 0, so
    the paper's max(0,·) clamp is satisfied by construction), the
    same smoothed-distribution machinery unigram_kl_by_source
    verifies. Emits per source the baseline share, the excess loss,
    the updated mixture weight, and the resampling ratio a weighted
    sampler consumes (sample_weighted_orders is the mechanism twin).

    Cross-engine determinism: the KL rides the DECIMAL(28,14)
    order-independent sum and is ROUNDED to 6 dp before exp() in
    BOTH engines, so the exponential's input is bit-identical; the
    normalizer Z is a DECIMAL(28,18) sum over the |sources|-row
    frame.

    Scale shape: identical to unigram_kl_by_source — one corpus
    explode into a (source, word) hash aggregate (checkpointed,
    four consumers), everything after on vocabulary-sized frames;
    the DRO update itself is closed-form column arithmetic on a
    |sources|-row frame under a single-partition window (k rows)."""
    d = load(spark, sf_dir, "documents")
    cnt = (
        d.select("source", F.explode(_text_tokens("text")).alias("word"))
        .groupBy("source", "word")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    corpus = cnt.groupBy("word").agg(F.sum("c").alias("cc"))
    vstats = corpus.agg(F.count("*").alias("v"), F.sum("cc").alias("nc"))
    tot = cnt.groupBy("source").agg(F.sum("c").alias("ns"))
    grid = tot.crossJoin(corpus).crossJoin(F.broadcast(vstats))
    j = grid.join(cnt, ["source", "word"], "left").select(
        "source",
        "ns",
        "nc",
        (
            (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0))
            / (F.col("ns") + F.col("v"))
        ).alias("ps"),
        ((F.col("cc") + F.lit(1.0)) / (F.col("nc") + F.col("v"))).alias(
            "pc"
        ),
    )
    kl = j.groupBy("source").agg(
        F.max("ns").alias("ns"),
        F.round(
            F.sum(
                (F.col("ps") * F.log(F.col("ps") / F.col("pc"))).cast(
                    "decimal(28,14)"
                )
            ).cast("double"),
            6,
        ).alias("excess"),
    )
    from datasette_upload_csvs_spark.operators import mixing

    # the DRO update itself (operators/mixing.py) derives the corpus
    # total as SUM(ns) over the |sources|-row frame — the same exact
    # integer the oracle's vstats.nc carries, since every token
    # belongs to exactly one source
    return mixing.doremi_reweight(kl)


@q(
    "lsh_band_scurve",
    """
    WITH cfg AS (
      SELECT * FROM (VALUES (8, 16), (16, 8), (32, 4), (64, 2))
        AS t(bands, rows_per_band)
    )
    SELECT bands, rows_per_band,
           round(pow(1.0 / bands, 1.0 / rows_per_band), 6) AS threshold,
           round(1 - pow(1 - pow(0.5, rows_per_band), bands), 6) AS p_s50,
           round(1 - pow(1 - pow(0.7, rows_per_band), bands), 6) AS p_s70,
           round(1 - pow(1 - pow(0.8, rows_per_band), bands), 6) AS p_s80,
           round(1 - pow(1 - pow(0.9, rows_per_band), bands), 6) AS p_s90,
           round(1 - pow(1 - pow(0.95, rows_per_band), bands), 6) AS p_s95
    FROM cfg
    """,
)
def lsh_band_scurve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The banded-MinHash S-curve design table (Broder '97 banding
    analysis as presented in Leskovec/Rajaraman/Ullman, MMDS ch. 3):
    for every (b, r) factorization of the 128-permutation signature
    dedup_minhash_lsh uses, the candidate probability at Jaccard s is
    1 − (1 − s^r)^b and the curve's waterline sits at t ≈ (1/b)^(1/r).
    This is the table a 100 TB dedup run reads to PICK its banding —
    e.g. b=32/r=4 puts the threshold at 0.42 with p(0.8) ≈ 0.9999,
    while b=8/r=16 pushes the threshold to 0.88 and drops sub-0.7
    candidates to noise. The engine's own default (32 bands × 4 rows)
    is one of the rows, so the filed curve documents the recall/cost
    tradeoff behind minhash_near_dup_pairs' candidate volume.

    Closed-form column math over a 4-row literal frame — no table
    read, no shuffle; outputs rounded to 6 dp (pow is the only libm
    call and feeds no branch, so cross-engine ulp drift cannot flip
    a value past the rounding boundary)."""
    cfg = spark.createDataFrame(
        [(8, 16), (16, 8), (32, 4), (64, 2)],
        "bands int, rows_per_band int",
    )
    b = F.col("bands").cast("double")
    r = F.col("rows_per_band").cast("double")

    def p_at(s: float):
        return F.round(
            F.lit(1.0) - F.pow(F.lit(1.0) - F.pow(F.lit(s), r), b), 6
        )

    return cfg.select(
        "bands",
        "rows_per_band",
        F.round(F.pow(F.lit(1.0) / b, F.lit(1.0) / r), 6).alias(
            "threshold"
        ),
        p_at(0.5).alias("p_s50"),
        p_at(0.7).alias("p_s70"),
        p_at(0.8).alias("p_s80"),
        p_at(0.9).alias("p_s90"),
        p_at(0.95).alias("p_s95"),
    )


# ====================================================================
# entry() flagship
# ====================================================================


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    return q1_pricing_summary(spark, sf_dir)

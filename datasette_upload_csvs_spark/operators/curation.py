"""Training-corpus curation operators: repetition filtering,
boilerplate stripping, sequence packing, PII redaction, mixture
rebalancing, and deterministic shuffle ordering.

These are the passes an LLM-pretraining data pipeline runs between
"raw documents" and "tokenizer-ready shards" (the reference —
datasette-upload-csvs — stops at ingest; this module is part of the
mandated large-scale-pipeline extension surface, like operators/
dedup.py and operators/textstats.py).

Design rules shared by every function here:

- Catalyst-only expressions (split/filter/transform/regexp/window);
  no Python in the row path, so everything stays in whole-stage
  codegen and scales to billions of documents.
- Determinism by content, not by RNG or partition layout: anything
  "random" (sampling, shuffling) keys off md5 of the row's own id
  (the md5_number_lower convention, operators/export.py), so results
  are reproducible cross-run, cross-engine, and under AQE re-plans.
- Every operator's logic is mirror-able in ANSI SQL → each has a
  DuckDB oracle in queries.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from datasette_upload_csvs_spark.functions.text import tokens
from datasette_upload_csvs_spark.operators.export import md5_low64


def _bigrams(t: Column) -> Column:
    """Non-distinct adjacent-token bigrams of a token array.

    transform-with-index over the first n-1 tokens; element_at is
    1-based so token i (0-based) pairs with element_at(t, i+2).
    Empty/1-token docs yield an empty array, not null.
    """
    n = F.size(t)
    return F.when(
        n >= 2,
        F.transform(
            F.slice(t, 1, n - 1),
            lambda x, i: F.concat_ws(" ", x, F.element_at(t, i + F.lit(2))),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_word_frac: float = 0.55,
    max_top_word_frac: float = 0.10,
    max_dup_bigram_frac: float = 0.05,
) -> DataFrame:
    """Gopher-style repetition signals + keep verdict per document.

    (Rae et al., "Scaling Language Models: ... Gopher", §A1.1: a doc
    dominated by a few repeated words/n-grams is template spam, not
    prose.) Signals:

      dup_word_frac   = 1 - distinct_words / total_words
      top_word_frac   = occurrences of the most frequent word / total
      dup_bigram_frac = 1 - distinct_bigrams / total_bigrams

    Shape at scale: explode to (doc, token) and aggregate twice —
    (doc_id, token) count then per-doc sum/max/count. Both shuffles
    hash on doc-keyed keys, so partial (map-side) aggregation does
    most of the work; no per-doc nested-loop HOFs in the hot path.
    The word and bigram branches share the doc_id shuffle key, so
    the final join is co-partitioned.

    Every input doc gets exactly one output row — including empty /
    whitespace-only docs, which explode would otherwise drop: they
    come back with n_words=0, all fractions 0.0, keep=true
    (repetition evidence is vacuous on an empty doc; minimum-length
    screening is quality_scores' job). This keeps curate_corpus's
    semi-join and curation_stream's one-row-per-doc contract honest.
    """
    t = tokens(F.col(text_col))
    base = docs.select(F.col(id_col), t.alias("t"))

    words = (
        base.select(id_col, F.explode("t").alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count("*").alias("cnt"))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_words"),
            F.max("cnt").alias("top_cnt"),
            F.count("*").alias("n_distinct_words"),
        )
    )
    bigrams = (
        base.select(id_col, F.explode(_bigrams(F.col("t"))).alias("b"))
        .groupBy(id_col, "b")
        .agg(F.count("*").alias("cnt"))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.count("*").alias("n_distinct_bigrams"),
        )
    )

    dup_w = F.when(
        F.coalesce(F.col("n_words"), F.lit(0)) == 0, 0.0
    ).otherwise(1.0 - F.col("n_distinct_words") / F.col("n_words"))
    top_w = F.when(
        F.coalesce(F.col("n_words"), F.lit(0)) == 0, 0.0
    ).otherwise(F.col("top_cnt") / F.col("n_words"))
    dup_b = F.when(F.col("n_bigrams").isNull() | (F.col("n_bigrams") == 0), 0.0).otherwise(
        1.0 - F.col("n_distinct_bigrams") / F.col("n_bigrams")
    )
    return (
        base.select(id_col)
        .join(words, id_col, "left")
        .join(bigrams, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_words"), F.lit(0)).alias("n_words"),
            F.round(dup_w, 6).alias("dup_word_frac"),
            F.round(top_w, 6).alias("top_word_frac"),
            F.round(dup_b, 6).alias("dup_bigram_frac"),
            (
                (dup_w <= max_dup_word_frac)
                & (top_w <= max_top_word_frac)
                & (dup_b <= max_dup_bigram_frac)
            ).alias("keep"),
        )
    )


def strip_boilerplate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df_frac: float = 0.78,
) -> DataFrame:
    """Remove tokens whose document frequency exceeds max_df_frac
    (CCNet-style boilerplate cut: a token present in ~every document
    is navigation/license chrome, not content).

    Two aggregates build the stop set — distinct (doc, token) pairs
    → per-token doc counts → tokens above the cut — then ONE row
    carrying the sorted stop array is broadcast-cross-joined back and
    each doc filters its token array in codegen (array_contains on a
    small array). The stop set is bounded above by 1/max_df_frac
    distinct tokens ... per df mass, i.e. tiny at any corpus size, so
    the broadcast never grows with data volume. Order within a doc is
    preserved by F.filter (no explode/re-sort round trip).
    """
    t = tokens(F.col(text_col))
    base = docs.select(F.col(id_col), t.alias("t"))
    n_docs = base.select(F.count("*").alias("n_docs"))

    stop = (
        base.select(F.explode(F.array_distinct(F.col("t"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") > F.col("n_docs") * F.lit(max_df_frac))
        .agg(F.sort_array(F.collect_list("tok")).alias("stop"))
    )

    kept = F.filter(
        F.col("t"), lambda x: ~F.array_contains(F.col("stop"), x)
    )
    return (
        base.crossJoin(F.broadcast(stop))
        .select(
            F.col(id_col),
            F.size("t").alias("n_tokens_before"),
            F.size(kept).alias("n_tokens_after"),
            F.md5(F.concat_ws(" ", kept)).alias("clean_hash"),
        )
    )


def pack_concat_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 512,
    bucket_size: int = 1000,
) -> DataFrame:
    """Concat-and-chunk sequence packing: lay all documents end to
    end in id order and cut every `chunk_tokens` tokens — the packing
    most pretraining loaders use (no padding waste; docs may span a
    chunk boundary). Returns each doc's global token offset and the
    first/last chunk it lands in.

    The global prefix sum is computed DISTRIBUTED: a global
    `sum() over (order by id)` window would serialize onto one
    partition, so instead (1) docs bucket by id range, (2) per-bucket
    token totals (a tiny aggregate) are prefix-summed and broadcast
    back, (3) the within-bucket running sum is a window partitioned
    by bucket. Wall-clock scales with the largest bucket, not the
    corpus — the standard two-phase scan/prefix pattern.
    """
    n = F.greatest(F.size(tokens(F.col(text_col))), F.lit(1))
    base = docs.select(
        F.col(id_col),
        n.alias("n_tokens"),
        (F.col(id_col) / F.lit(bucket_size)).cast("bigint").alias("b"),
    )

    # phase 1: per-bucket totals; phase 2: exclusive prefix over the
    # (tiny) bucket list — the only global window runs over one row
    # per bucket.
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    bucket_prefix = (
        base.groupBy("b")
        .agg(F.sum("n_tokens").alias("bucket_total"))
        .withColumn(
            "bucket_prefix", F.coalesce(F.sum("bucket_total").over(wb), F.lit(0))
        )
        .select("b", "bucket_prefix")
    )

    ww = (
        Window.partitionBy("b")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.col("bucket_prefix") + F.coalesce(F.sum("n_tokens").over(ww), F.lit(0))
    return (
        base.join(F.broadcast(bucket_prefix), "b")
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            start.alias("start_offset"),
            F.floor(start / F.lit(chunk_tokens)).alias("first_chunk"),
            F.floor((start + F.col("n_tokens") - 1) / F.lit(chunk_tokens)).alias(
                "last_chunk"
            ),
        )
    )


EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PHONE_RE = r"[+]1-[0-9]{3}-[0-9]{4}"


def redact_pii(
    df: DataFrame, text_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Regex PII scrub: emails → [EMAIL], NANP-style phone numbers →
    [PHONE], with per-row match counts. Regexes stay in the portable
    syntax subset (no backrefs/lookaround) so Java regex (Spark) and
    RE2 (DuckDB) agree byte-for-byte. Pure codegen expressions —
    regexp_count + regexp_replace — a map-only pass at any scale.
    """
    redacted = F.regexp_replace(
        F.regexp_replace(F.col(text_col), EMAIL_RE, "[EMAIL]"),
        PHONE_RE,
        "[PHONE]",
    )
    return df.select(
        F.col(id_col),
        F.regexp_count(F.col(text_col), F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(F.col(text_col), F.lit(PHONE_RE)).alias("n_phones"),
        F.md5(redacted).alias("redacted_hash"),
    )


def rebalance_to_uniform(
    docs: DataFrame, strata_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Downsample every stratum to the size of the smallest one
    (uniform source mixture — the "rebalance web-heavy crawl against
    curated sources" pass). Keep decision is content-deterministic:
    md5(id)/2^64 < min_count/stratum_count, so membership survives
    repartitions and incremental reruns. Per-stratum counts and the
    global min are broadcast; the filter itself is map-side.

    Returns per-stratum (n_docs, n_kept) so the mixture is auditable;
    compose with the same filter to materialize the kept rows.
    """
    # the global min is a window over the one-row-per-stratum
    # aggregate, so `counts` has a single consumer and the corpus is
    # scanned once — no persist (and no executor-storage leak; the
    # round-4 advice flagged a persist here that nothing unpersisted)
    counts = docs.groupBy(strata_col).agg(F.count("*").alias("n_docs"))
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rates = counts.select(
        strata_col,
        "n_docs",
        (
            F.min("n_docs").over(w).cast("double") / F.col("n_docs")
        ).alias("rate"),
    )
    u = (md5_low64(F.col(id_col)) / F.lit(float(1 << 64))).cast("double")
    return (
        docs.join(F.broadcast(rates), strata_col)
        .select(F.col(strata_col), F.col("n_docs"), (u < F.col("rate")).alias("kept"))
        .groupBy(strata_col, "n_docs")
        .agg(F.sum(F.col("kept").cast("bigint")).alias("n_kept"))
    )


def shuffle_shards(
    docs: DataFrame,
    id_col: str = "doc_id",
    num_shards: int = 8,
    salt: str = "shuffle-v1",
) -> DataFrame:
    """Deterministic global training-order shuffle, sharded.

    Every doc gets a content-defined position: shard = md5 % N,
    position-in-shard = rank of md5 within the shard. A training
    loader reads shards independently in parallel — no global sort —
    and the order is reproducible bit-for-bit (and auditable in the
    oracle) because the "randomness" is md5(id || salt). Changing the
    salt is a fresh epoch-level reshuffle. The only shuffle is the
    hash partition by shard; within-shard rank is a per-partition
    window sort over 1/N of the data.
    """
    h = md5_low64(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    w = Window.partitionBy("shard_id").orderBy("h", id_col)
    return (
        docs.select(
            F.col(id_col),
            h.alias("h"),
            F.pmod(h, F.lit(num_shards)).cast("int").alias("shard_id"),
        )
        .withColumn("pos_in_shard", F.row_number().over(w))
        .select(id_col, "shard_id", "pos_in_shard")
    )

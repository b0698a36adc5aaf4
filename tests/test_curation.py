"""Curation-operator tests: semantics edges the oracle can't see
(determinism under repartition, distributed-prefix-sum equivalence)
plus plan-shape guards for the 100 TB contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from datasette_upload_csvs_spark import plans
from datasette_upload_csvs_spark.operators import curation
from datasette_upload_csvs_spark.sources.parquet import read_table


def docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents")


# ---------- semantics ----------


def test_repetition_single_token_doc(spark):
    d = spark.createDataFrame(
        [(1, "hello"), (2, "a a a a"), (3, "w x y z")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in curation.repetition_stats(
            d, max_top_word_frac=0.5
        ).collect()
    }
    # 1-token doc: no bigrams -> dup_bigram_frac 0, never divides by zero
    assert out[1].dup_bigram_frac == 0.0 and out[1].n_words == 1
    # all-same doc: dup_word_frac 0.75, top_word_frac 1.0, rejected
    assert out[2].top_word_frac == 1.0 and not out[2].keep
    # all-distinct doc: zero repetition, kept
    assert out[3].dup_word_frac == 0.0 and out[3].keep


def test_pack_chunks_prefix_is_exact(spark, sf_dir):
    """The two-phase distributed prefix sum must equal the naive
    global running sum: offsets strictly increase by n_tokens in id
    order with no gaps."""
    rows = (
        curation.pack_concat_chunks(docs(spark, sf_dir), bucket_size=17)
        .orderBy("doc_id")
        .collect()
    )
    expect = 0
    for r in rows:
        assert r.start_offset == expect, (r.doc_id, r.start_offset, expect)
        assert r.first_chunk == r.start_offset // 512
        assert r.last_chunk == (r.start_offset + r.n_tokens - 1) // 512
        expect += r.n_tokens


def test_shuffle_order_stable_under_repartition(spark, sf_dir):
    d = docs(spark, sf_dir)
    a = sorted(map(tuple, curation.shuffle_shards(d).collect()))
    b = sorted(map(tuple, curation.shuffle_shards(d.repartition(7)).collect()))
    assert a == b
    # different salt => genuinely different order
    c = sorted(
        map(tuple, curation.shuffle_shards(d, salt="shuffle-v2").collect())
    )
    assert a != c


def test_rebalance_hits_uniform_target(spark, sf_dir):
    rows = curation.rebalance_to_uniform(docs(spark, sf_dir), "source").collect()
    min_n = min(r.n_docs for r in rows)
    for r in rows:
        # kept counts concentrate near the smallest stratum's size
        assert r.n_kept <= r.n_docs
        assert abs(r.n_kept - min_n) <= max(5, int(0.35 * min_n)), (
            r.source, r.n_kept, min_n,
        )


def test_redact_pii_counts_and_text(spark):
    d = spark.createDataFrame(
        [(1, "mail bob@x.org and +1-555-0199 plus eve@y.io")],
        "doc_id long, text string",
    )
    r = curation.redact_pii(d, "text").collect()[0]
    assert (r.n_emails, r.n_phones) == (2, 1)


# ---------- plan shapes ----------


def test_redact_pii_is_map_only(spark, sf_dir):
    df = curation.redact_pii(docs(spark, sf_dir), "text")
    assert plans.shuffle_count(df) == 0
    assert set(plans.read_schema_columns(df)) == {"doc_id", "text"}


def test_strip_boilerplate_broadcasts_stop_set(spark, sf_dir):
    df = curation.strip_boilerplate(docs(spark, sf_dir))
    assert plans.uses_broadcast_join(df)
    assert set(plans.read_schema_columns(df)) == {"doc_id", "text"}


def test_pack_chunks_no_global_data_window(spark, sf_dir):
    """The full-corpus side must never serialize onto one partition:
    at most one SinglePartition exchange (the per-bucket prefix,
    one row per bucket), and the bucket prefixes are broadcast."""
    df = curation.pack_concat_chunks(docs(spark, sf_dir))
    txt = plans.executed_plan(df)
    assert txt.count("Exchange SinglePartition") <= 1, txt
    assert plans.uses_broadcast_join(df)


def test_shuffle_order_single_exchange(spark, sf_dir):
    df = curation.shuffle_shards(docs(spark, sf_dir))
    assert plans.shuffle_count(df) == 1


def test_repetition_reads_only_needed_columns(spark, sf_dir):
    df = curation.repetition_stats(docs(spark, sf_dir))
    # the all-docs anchor scan (empty-doc rows) prunes to doc_id
    # alone; the token-stat scans read exactly (doc_id, text); no
    # scan reads anything else
    txt = plans.formatted_plan(df)
    scans = []
    for line in txt.splitlines():
        if "ReadSchema" in line:
            inner = line.split("ReadSchema:", 1)[1].strip()
            inner = inner[inner.find("<") + 1 : inner.rfind(">")]
            scans.append(
                {c.split(":")[0].strip() for c in inner.split(",") if c}
            )
    assert scans
    assert all(s <= {"doc_id", "text"} for s in scans)
    assert any("text" in s for s in scans)


def test_repetition_keeps_empty_docs(spark):
    """Empty/whitespace docs must not vanish (ADVICE: explode dropped
    them before the aggregate, silently removing them downstream):
    they get n_words=0, zero fractions, keep=true."""
    healthy = " ".join(f"w{i}" for i in range(20))  # top_word_frac 0.05
    df = spark.createDataFrame(
        [(1, healthy), (2, ""), (3, "   "), (4, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in curation.repetition_stats(df).collect()}
    assert set(out) == {1, 2, 3, 4}
    for d in (2, 3, 4):
        r = out[d]
        assert r["n_words"] == 0
        assert r["dup_word_frac"] == r["top_word_frac"] == 0.0
        assert r["dup_bigram_frac"] == 0.0
        assert r["keep"] is True
    assert out[1]["n_words"] == 20 and out[1]["keep"] is True

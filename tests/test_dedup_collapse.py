"""Exact-dup collapse in minhash_near_dup_pairs (the banded-LSH skew
hole): K identical docs share a signature, land in the same bucket of
all 32 bands, and the bucket self-join does 32·K²/2 work. The
collapse bands/verifies one representative per shingle-set group and
expands afterward — these tests pin that the OUTPUT is identical to
the plain path (both floor settings), that the distributed clique
expansion enumerates exactly C(K,2) pairs, and that the dup-mass
gate leaves light-dup corpora on the plain plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datasette_upload_csvs_spark.operators import dedup


@pytest.fixture()
def dup_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n = docs.count()
    copies = [
        docs.filter(F.pmod("doc_id", F.lit(7)) == 0).select(
            (F.col("doc_id") + F.lit((i + 1) * 10 * n)).alias("doc_id"),
            "text",
        )
        for i in range(3)
    ]
    corpus = docs
    for c in copies:
        corpus = corpus.unionByName(c)
    yield corpus.persist()
    spark.catalog.clearCache()


@pytest.mark.parametrize("floor", [None, 5])
def test_collapsed_output_identical(spark, dup_corpus, floor, monkeypatch):
    # force the gate open so the collapsed path runs on the small
    # fixture (the production gate needs >=1024 duplicated docs)
    monkeypatch.setattr(dedup, "_COLLAPSE_MIN_DUP", 1)
    kw = dict(threshold=0.7, exact_floor_max_df=floor)
    a = sorted(
        map(
            tuple,
            dedup.minhash_near_dup_pairs(
                dup_corpus, collapse_exact=True, **kw
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            dedup.minhash_near_dup_pairs(
                dup_corpus, collapse_exact=False, **kw
            ).collect(),
        )
    )
    assert a == b
    assert len(a) > 0
    spark.catalog.clearCache()


def test_gate_skips_light_dup_corpora(spark, dup_corpus):
    # default gate (1024 duplicated docs): this fixture is far below
    # it, so collapse_exact=True must produce the PLAIN plan — no
    # group/member machinery in the executed plan, output unchanged
    df = dedup.minhash_near_dup_pairs(dup_corpus, threshold=0.7)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "_rep" not in plan
    assert df.count() > 0
    spark.catalog.clearCache()


@pytest.mark.parametrize("k", [2, 5, 100])
def test_intra_clique_enumerates_exactly(spark, k):
    ids = [(i * 3 + 7) for i in range(k)]  # non-contiguous ids
    members = spark.createDataFrame(
        [(i, 7, k) for i in ids], "doc_id long, _rep long, _gc long"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup._intra_clique_pairs(members, "doc_id").collect()
    }
    s = sorted(ids)
    want = {(a, b) for i, a in enumerate(s) for b in s[i + 1 :]}
    assert got == want
    assert len(got) == k * (k - 1) // 2


# ---------------------------------------------------------------------------
# the vector twin: embedding_ann_batch's exact-dup collapse
# ---------------------------------------------------------------------------

from datasette_upload_csvs_spark.streaming.ann_stream import (
    embedding_ann_batch,
)


def test_ann_collapsed_output_identical(spark, sf_dir, monkeypatch):
    monkeypatch.setattr(dedup, "_COLLAPSE_MIN_DUP", 1)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    copies = [
        emb.filter(F.pmod("vec_id", F.lit(5)) == 0).select(
            (F.col("vec_id") + F.lit((i + 1) * 10 * n)).alias("vec_id"),
            "embedding",
        )
        for i in range(3)
    ]
    corpus = emb
    for c in copies:
        corpus = corpus.unionByName(c)
    corpus = corpus.persist()
    a = sorted(
        map(tuple, embedding_ann_batch(corpus, collapse_exact=True).collect())
    )
    b = sorted(
        map(tuple, embedding_ann_batch(corpus, collapse_exact=False).collect())
    )
    assert a == b
    # the planted copies guarantee intra-group pairs exist, so the
    # collapse's expansion + self-cosine path actually ran
    assert len(a) >= 3 * (n // 5 + (1 if n % 5 else 0))
    spark.catalog.clearCache()


def test_ann_gate_skips_light_dup(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    df = embedding_ann_batch(emb)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "_rep" not in plan
    spark.catalog.clearCache()


# ---------------------------------------------------------------------------
# the SimHash twin: fingerprint-equality collapse (semantically exact)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("portable", [False, True])
def test_simhash_collapsed_output_identical(
    spark, dup_corpus, portable, monkeypatch
):
    monkeypatch.setattr(dedup, "_COLLAPSE_MIN_DUP", 1)
    kw = dict(max_hamming=3, portable=portable)
    a = sorted(
        map(
            tuple,
            dedup.simhash_near_dup_pairs(
                dup_corpus, collapse_exact=True, **kw
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            dedup.simhash_near_dup_pairs(
                dup_corpus, collapse_exact=False, **kw
            ).collect(),
        )
    )
    assert a == b
    assert len(a) > 0
    spark.catalog.clearCache()


def test_simhash_gate_skips_light_dup(spark, dup_corpus):
    df = dedup.simhash_near_dup_pairs(dup_corpus, max_hamming=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "_rep" not in plan
    assert df.count() > 0
    spark.catalog.clearCache()


def test_dup_mass_stats_equals_groupby_gate(spark, dup_corpus):
    # r14: the collapse gate reads (nd, ng) from ONE exact aggregate
    # (_dup_mass_stats) instead of the old keyed groupBy chain — pin
    # the statistic bit-equal to that chain's on a dup-heavy corpus
    # and on the clean base corpus, so every gate decision is
    # provably unchanged.
    # r15: NULL-keyed corpus too — length(NULL text) is NULL, which a
    # bare count_distinct(a, b) silently DROPS while groupBy counts
    # the NULL-keyed group; _dup_mass_stats wraps the keys in one
    # struct so the statistic stays bit-equal on corpora with NULL
    # keys (the r14 ADVICE gap).
    with_nulls = dup_corpus.unionByName(
        dup_corpus.sparkSession.createDataFrame(
            [(9_000_001, None), (9_000_002, None), (9_000_003, "x")],
            "doc_id long, text string",
        ).select("doc_id", "text", *[
            F.lit(None).cast(t.dataType).alias(t.name)
            for t in dup_corpus.schema.fields
            if t.name not in ("doc_id", "text")
        ])
    )
    for docs in (
        dup_corpus,
        dup_corpus.filter("doc_id < 100000"),
        with_nulls,
    ):
        keyed = docs.select(
            "doc_id",
            F.xxhash64("text").alias("_k"),
            F.length("text").alias("_sz"),
        )
        old = (
            keyed.groupBy("_k", "_sz")
            .agg(F.count("*").alias("_gc"))
            .agg(F.sum("_gc").alias("nd"), F.count("*").alias("ng"))
            .first()
        )
        nd, ng = dedup._dup_mass_stats(
            docs, F.xxhash64("text"), F.length("text")
        )
        assert (nd, ng) == (old["nd"], old["ng"])
    spark.catalog.clearCache()

"""pair_mode="star" — the connectivity-equivalent linear output of
the near-dup pair pipelines (round-8 VERDICT item 1).

The clique contract emits C(K,2) intra-group pairs for a K-duplicate
group and |A|·|B| member pairs per verified group pair; star emits
K−1 rep→member edges and ONE rep-level edge per verified group pair.
These tests pin the two invariants star mode rests on:

1. identical transitive closure — connected components computed from
   the star edge set equal those from the clique edge set;
2. identical vertex set — the set of documents touching ≥1 edge is
   the same (the dup-rate audit's contract);

plus the linearity claim itself: a K-dup group contributes exactly
K−1 intra rows in star mode, and star == clique (the full relation)
when the dup-mass gate does not trip.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datasette_upload_csvs_spark.operators import dedup, graph
from datasette_upload_csvs_spark.streaming.ann_stream import (
    embedding_ann_batch,
)


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


def _components(pairs):
    cc = graph.connected_components(pairs.select("id_a", "id_b"))
    return sorted(map(tuple, cc.collect()))


def _vertices(pairs):
    return sorted(
        r["v"]
        for r in pairs.select(F.col("id_a").alias("v"))
        .unionAll(pairs.select(F.col("id_b").alias("v")))
        .distinct()
        .collect()
    )


@pytest.mark.parametrize("floor", [None, 5])
def test_minhash_star_components_identical(
    spark, dup_corpus, floor, monkeypatch
):
    monkeypatch.setattr(dedup, "_COLLAPSE_MIN_DUP", 1)
    kw = dict(threshold=0.7, exact_floor_max_df=floor)
    clique = dedup.minhash_near_dup_pairs(
        dup_corpus, pair_mode="clique", **kw
    )
    star = dedup.minhash_near_dup_pairs(dup_corpus, pair_mode="star", **kw)
    assert _components(star) == _components(clique)
    assert _vertices(star) == _vertices(clique)
    # star is a subset of the clique relation, strictly smaller here
    # (the fixture plants 4-member groups: 3 star rows vs 6 clique
    # rows per group)
    nc, ns = clique.count(), star.count()
    assert 0 < ns < nc
    spark.catalog.clearCache()


def test_minhash_star_intra_rows_linear(spark, monkeypatch):
    # one K-dup group of identical text + unique filler: star intra
    # output must be exactly K-1 rows, the linearity contract
    monkeypatch.setattr(dedup, "_COLLAPSE_MIN_DUP", 1)
    k = 50
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(k)]
    rows += [
        (1000 + i, f"unique{i} filler{i} words{i} here{i} now{i} end{i}")
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    star = dedup.minhash_near_dup_pairs(
        docs, threshold=0.7, pair_mode="star"
    )
    got = sorted(map(tuple, star.select("id_a", "id_b").collect()))
    assert got == [(0, i) for i in range(1, k)]
    clique = dedup.minhash_near_dup_pairs(
        docs, threshold=0.7, pair_mode="clique"
    )
    assert clique.count() == k * (k - 1) // 2
    spark.catalog.clearCache()


def test_minhash_star_equals_clique_below_gate(spark, dup_corpus):
    # default gate (1024 duplicated docs): members is None, so star
    # mode IS the full relation
    kw = dict(threshold=0.7)
    a = sorted(
        map(
            tuple,
            dedup.minhash_near_dup_pairs(
                dup_corpus, pair_mode="star", **kw
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            dedup.minhash_near_dup_pairs(
                dup_corpus, pair_mode="clique", **kw
            ).collect(),
        )
    )
    assert a == b and len(a) > 0
    spark.catalog.clearCache()


def test_minhash_pair_mode_validated(spark, dup_corpus):
    with pytest.raises(ValueError):
        dedup.minhash_near_dup_pairs(dup_corpus, pair_mode="chain")
    with pytest.raises(ValueError):
        dedup.simhash_near_dup_pairs(dup_corpus, pair_mode="chain")
    with pytest.raises(ValueError):
        embedding_ann_batch(dup_corpus, pair_mode="chain")


@pytest.mark.parametrize("portable", [False, True])
def test_simhash_star_components_identical(
    spark, dup_corpus, portable, monkeypatch
):
    monkeypatch.setattr(dedup, "_COLLAPSE_MIN_DUP", 1)
    kw = dict(max_hamming=3, portable=portable)
    clique = dedup.simhash_near_dup_pairs(
        dup_corpus, pair_mode="clique", **kw
    )
    star = dedup.simhash_near_dup_pairs(dup_corpus, pair_mode="star", **kw)
    assert _components(star) == _components(clique)
    assert _vertices(star) == _vertices(clique)
    assert 0 < star.count() < clique.count()
    spark.catalog.clearCache()


def test_ann_star_components_identical(spark, sf_dir, monkeypatch):
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
    clique = embedding_ann_batch(corpus, pair_mode="clique")
    star = embedding_ann_batch(corpus, pair_mode="star")
    assert _components(star) == _components(clique)
    assert _vertices(star) == _vertices(clique)
    assert 0 < star.count() < clique.count()
    # star rows carry the group's verified self-cosine: for planted
    # identical copies that is exactly 1.0
    intra = star.filter(F.col("id_b") >= 10 * n)
    assert intra.count() > 0
    assert intra.filter(F.col("cos_sim") != 1.0).count() == 0
    spark.catalog.clearCache()

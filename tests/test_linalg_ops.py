"""Structural invariants for the round-6 linear-algebra / corpus-
statistics entries — properties the DuckDB hash gate cannot state
(it proves engine equality, not that the math is the right math)."""

from __future__ import annotations

import math

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()


def test_power_iteration_unit_norm(spark, sf_dir):
    rows = QUERIES["embedding_pca_power_iteration"](spark, sf_dir).collect()
    # one loading per dimension, unit-norm direction, positive step norm
    assert len(rows) == len({r["pos"] for r in rows})
    sq = sum(r["loading"] ** 2 for r in rows)
    assert math.isclose(sq, 1.0, abs_tol=1e-4)  # loadings rounded to 6dp
    assert all(r["gram_norm"] > 0 for r in rows)


def test_kmeans_step_partitions_corpus(spark, sf_dir):
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    rows = QUERIES["kmeans_lloyd_step"](spark, sf_dir).collect()
    assert len(rows) == 8  # every seed centroid keeps its own vector
    assert sum(r["n_members"] for r in rows) == n_vecs
    assert all(r["inertia"] >= 0 for r in rows)
    assert all(r["new_centroid_norm"] > 0 for r in rows)


def test_zipf_slope_negative(spark, sf_dir):
    rows = QUERIES["zipf_slope_by_source"](spark, sf_dir).collect()
    assert rows
    # rank-frequency is monotone-decreasing by construction, so every
    # fitted slope must be negative
    assert all(r["zipf_slope"] < 0 for r in rows)
    assert all(r["n_ranks"] >= 2 for r in rows)


def test_ngram_diversity_bounds(spark, sf_dir):
    rows = QUERIES["ngram_diversity_by_source"](spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        assert 0 < r["ttr"] <= 1
        assert r["distinct_ngrams"] <= r["total_ngrams"]
        by_src.setdefault(r["source"], {})[r["n"]] = r
    for src, d in by_src.items():
        assert set(d) == {1, 2, 3}
        # each doc loses n-1 grams as n grows
        assert d[1]["total_ngrams"] > d[2]["total_ngrams"] > d[3]["total_ngrams"]


def test_unigram_kl_nonnegative(spark, sf_dir):
    rows = QUERIES["unigram_kl_by_source"](spark, sf_dir).collect()
    assert rows
    # KL is nonnegative up to the 6dp output rounding
    assert all(r["kl_to_corpus"] >= -1e-6 for r in rows)
    vocab = {r["vocab_size"] for r in rows}
    assert len(vocab) == 1  # shared corpus-wide support


def test_semantic_decontamination_bounds(spark, sf_dir):
    rows = QUERIES["semantic_decontamination"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_flagged"] <= r["n_vecs"]
        assert -1.0 <= r["avg_max_sim"] <= r["top_max_sim"] <= 1.0

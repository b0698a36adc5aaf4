"""End-to-end corpus-curation pipeline test."""

from datasette_upload_csvs_spark import pipeline
from datasette_upload_csvs_spark import queries as Q


def test_curate_corpus(spark, sf_dir):
    docs = Q.load(spark, sf_dir, "documents")
    curated, stats = pipeline.curate_corpus(docs)
    assert stats.n_input == 500
    # no exact dups in this corpus; near-dups exist and are removed
    assert stats.n_after_exact_dedup == 500
    assert stats.n_after_near_dedup < 500
    # the word-soup corpus is highly repetitive: the Gopher cut bites
    assert 0 < stats.n_after_repetition < stats.n_after_near_dedup
    assert stats.n_after_quality <= stats.n_after_repetition
    assert stats.n_train + stats.n_val == stats.n_after_quality
    assert 0 < stats.n_val < stats.n_after_quality
    cols = set(curated.columns)
    assert {"doc_id", "text", "quality_score", "predicted_lang", "split"} <= cols
    # deterministic: rerun produces identical stats
    _, stats2 = pipeline.curate_corpus(docs)
    assert stats == stats2

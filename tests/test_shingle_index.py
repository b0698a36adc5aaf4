"""Maintained shingle index (operators/shingle_index.py): per-batch
edge queries against the managed-table index must equal the one-shot
capped path run over the full grown corpus with restrict_to_ids —
across multiple appends — and the index read must stay broadcast-
pruned (no corpus-keyed shuffle on the postings side)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datasette_upload_csvs_spark import plans
from datasette_upload_csvs_spark.operators import dedup
from datasette_upload_csvs_spark.operators.shingle_index import ShingleIndex


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _batches():
    base = " ".join(f"c{i}" for i in range(40))
    hot = " ".join(f"h{i}" for i in range(3))  # boilerplate in many docs
    b1 = [
        (1, base + " xa"),
        (2, base + " xb"),
        (10, f"{hot} " + " ".join(f"a10b{j}" for j in range(12))),
        (11, f"{hot} " + " ".join(f"a11b{j}" for j in range(12))),
    ]
    b2 = [
        (3, base + " xc"),  # near-dups docs 1 and 2 (old endpoints)
        (20, f"{hot} " + " ".join(f"a20b{j}" for j in range(12))),
        (21, " ".join(f"u21v{j}" for j in range(12))),  # isolated
    ]
    b3 = [
        (4, base + " xd"),
        (22, " ".join(f"u21v{j}" for j in range(12))),  # dups doc 21
    ]
    return b1, b2, b3


def _oneshot(spark, corpus_rows, new_rows, max_df=20):
    corpus = _docs(spark, corpus_rows)
    rid = _docs(spark, new_rows).select("doc_id")
    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in dedup.ngram_jaccard_pairs(
            corpus, threshold=0.7, max_df=max_df, restrict_to_ids=rid
        ).collect()
    }
    spark.catalog.clearCache()
    return got


def test_edges_match_oneshot_across_appends(spark):
    b1, b2, b3 = _batches()
    idx = ShingleIndex(spark, "tsix", num_buckets=4)
    idx.drop()
    try:
        corpus = []
        for i, batch in enumerate((b1, b2, b3)):
            got = {
                (r["id_a"], r["id_b"], round(r["jaccard"], 9))
                for r in idx.edges_for_batch(
                    _docs(spark, batch), threshold=0.7, max_df=20
                ).collect()
            }
            spark.catalog.clearCache()
            want = _oneshot(spark, corpus + batch, batch)
            assert got == want, (i, got, want)
            idx.append(_docs(spark, batch), batch=i)
            corpus += batch
        # the cross-batch near-dup (21, 22) must have been found
        b3_pairs = _oneshot(spark, corpus, b3)
        assert any(p[:2] == (21, 22) for p in b3_pairs)
    finally:
        idx.drop()
        spark.catalog.clearCache()


def test_df_cap_counts_whole_grown_corpus(spark):
    """A shingle under max_df within one batch but over it across
    the grown corpus must be dropped from candidate generation —
    df is sidecar-sum + batch count, not batch-local."""
    shared = "p q r"  # one 3-gram, present in every doc below
    mk = lambda i: (i, f"{shared} " + " ".join(f"z{i}w{j}" for j in range(9)))
    idx = ShingleIndex(spark, "tsixcap", num_buckets=2)
    idx.drop()
    try:
        idx.append(_docs(spark, [mk(i) for i in range(3)]), batch=0)
        batch = [mk(100)]
        # df("p q r") = 3 indexed + 1 new = 4 > max_df=3 → no pairs
        got = idx.edges_for_batch(
            _docs(spark, batch), threshold=0.05, max_df=3
        ).collect()
        assert got == []
        spark.catalog.clearCache()
        # same call with the cap above df finds the hot-shingle pairs
        got2 = idx.edges_for_batch(
            _docs(spark, batch), threshold=0.05, max_df=4
        ).collect()
        assert {(r["id_a"], r["id_b"]) for r in got2} == {
            (0, 100), (1, 100), (2, 100)
        }
    finally:
        idx.drop()
        spark.catalog.clearCache()


def test_index_read_is_broadcast_pruned(spark):
    """The postings/df-sidecar reads must be pruned by BROADCAST
    joins keyed on the batch's shingles — the index side never pays
    a shuffle to be joined (no SortMergeJoin/ShuffledHashJoin on
    shingle). The remaining shingle-keyed exchanges are the
    batch-scale aggregations (batch_sh, the rare doc-list group),
    whose inputs are already pruned to batch-touching rows."""
    b1, b2, _ = _batches()
    idx = ShingleIndex(spark, "tsixplan", num_buckets=4)
    idx.drop()
    try:
        idx.append(_docs(spark, b1), batch=0)
        df = idx.edges_for_batch(_docs(spark, b2), threshold=0.7, max_df=20)
        txt = plans.executed_plan(df)
        bhj_shingle = [
            ln for ln in txt.splitlines()
            if "BroadcastHashJoin [shingle" in ln.strip()
        ]
        assert bhj_shingle, txt  # the prune joins exist and broadcast
        # EVERY join is broadcast-built from batch-scale rows — the
        # index relations (postings, sets, df sidecar) are only ever
        # scanned map-side
        shuffled_joins = [
            ln for ln in txt.splitlines()
            if "SortMergeJoin" in ln or "ShuffledHashJoin" in ln
        ]
        assert not shuffled_joins, txt
    finally:
        idx.drop()
        spark.catalog.clearCache()

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
    idx = ShingleIndex(spark, "tsix")
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
    idx = ShingleIndex(spark, "tsixcap")
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
    """No join in the edge query shuffles a corpus-keyed relation:
    the postings/df-sidecar reads join the batch's shingles via
    BROADCAST (no SortMergeJoin/ShuffledHashJoin on shingle), and
    the sets reads join the candidate ids via BROADCAST (none on
    doc_id). A shuffled join is tolerated only between batch-scale
    sides keyed on the (id_a, id_b) candidate pairs. The remaining
    shingle-keyed exchanges are batch-scale aggregations whose
    inputs are already pruned to batch-touching rows."""
    b1, b2, _ = _batches()
    idx = ShingleIndex(spark, "tsixplan")
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
        bad = [
            ln for ln in txt.splitlines()
            if ("SortMergeJoin [shingle" in ln
                or "ShuffledHashJoin [shingle" in ln
                or "SortMergeJoin [doc_id" in ln
                or "ShuffledHashJoin [doc_id" in ln)
        ]
        assert not bad, txt
    finally:
        idx.drop()
        spark.catalog.clearCache()


def test_uncommitted_append_is_invisible_and_retry_is_idempotent(spark):
    """A crashed append (data partitions written, no commit marker)
    must not affect edge queries; retrying the same batch must
    replace — not duplicate — its rows."""
    b1, b2, _ = _batches()
    idx = ShingleIndex(spark, "tsixcommit")
    idx.drop()
    try:
        idx.append(_docs(spark, b1), batch=0)
        want = {
            (r["id_a"], r["id_b"])
            for r in idx.edges_for_batch(_docs(spark, b2)).collect()
        }
        spark.catalog.clearCache()

        # simulate a crash: write batch 1 data, then roll the marker
        # table back to batch 0 only (parquet tables can't DELETE —
        # rebuild it)
        idx.append(_docs(spark, b2), batch=1)
        committed = spark.table(idx.commits).filter("batch = 0")
        committed.write.mode("overwrite").format("parquet").saveAsTable(
            f"{idx.commits}_tmp"
        )
        spark.sql(f"DROP TABLE {idx.commits}")
        spark.sql(f"ALTER TABLE {idx.commits}_tmp RENAME TO {idx.commits}")

        got = {
            (r["id_a"], r["id_b"])
            for r in idx.edges_for_batch(_docs(spark, b2)).collect()
        }
        spark.catalog.clearCache()
        assert got == want  # orphan partitions invisible

        # retry the append: partitions overwritten, marker restored
        idx.append(_docs(spark, b2), batch=1)
        n_sets = spark.table(idx.sets).filter("batch = 1").count()
        assert n_sets == len(b2)  # no duplicated rows
        n_commits = (
            spark.table(idx.commits).filter("batch = 1").count()
        )
        assert n_commits == 1
    finally:
        idx.drop()
        spark.sql(f"DROP TABLE IF EXISTS {idx.commits}_tmp")
        spark.catalog.clearCache()


def test_release_batch_cache_frees_executor_storage(spark):
    """The caching contract's cleanup half: after a caller
    materializes the edges plan and calls release_batch_cache(), NO
    frame persisted by edges_for_batch may remain in executor
    storage — a long-running stream that leaks four persisted frames
    per micro-batch grows storage without bound (round-6 ADVICE)."""
    from datasette_upload_csvs_spark.operators.shingle_index import (
        ShingleIndex,
    )

    def n_cached():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    spark.catalog.clearCache()
    base = " ".join(f"t{i}" for i in range(30))
    b1 = [(1, base + " aa"), (2, base + " bb")]
    b2 = [(3, base + " cc")]
    idx = ShingleIndex(spark, "relcache")
    idx.drop()
    try:
        idx.append(spark.createDataFrame(b1, "doc_id long, text string"),
                   batch=0)
        before = n_cached()
        edges = idx.edges_for_batch(
            spark.createDataFrame(b2, "doc_id long, text string")
        ).localCheckpoint(eager=True)
        assert edges.count() >= 1  # real work happened
        assert n_cached() > before + 1  # the per-batch frames ARE cached
        idx.release_batch_cache()
        # everything the index persisted is freed; the single
        # remaining entry is the edges localCheckpoint itself, which
        # is the CALLER's (it holds the materialized result and is
        # GC-cleaned when the caller drops the frame)
        assert n_cached() == before + 1
    finally:
        idx.drop()
        spark.catalog.clearCache()


def test_legacy_commits_layout_migrates_on_first_touch(spark):
    """r9 ADVICE: an index built before the generational-fold change
    has a single-column unpartitioned commits table (batch only, no
    `b` payload, appended with saveAsTable). First touch through
    append/_committed/compact must migrate it to the (b, batch)
    partitioned layout instead of crashing on the missing column —
    and the migrated markers must gate exactly the batches the
    legacy table committed."""
    base = " ".join(f"m{i}" for i in range(30))
    b1 = [(1, base + " aa"), (2, base + " bb")]
    b2 = [(3, base + " cc")]
    idx = ShingleIndex(spark, "legmig")
    idx.drop()
    try:
        # build batch 0 under the CURRENT layout, then rewrite the
        # commits table into the legacy shape by hand
        idx.append(_docs(spark, b1), batch=0)
        legacy = spark.createDataFrame([(0,)], "batch bigint")
        spark.sql(f"DROP TABLE {idx.commits}")
        legacy.write.mode("overwrite").format("parquet").saveAsTable(
            idx.commits
        )
        assert spark.table(idx.commits).columns == ["batch"]

        # a query migrates and still sees batch 0 as committed
        edges = idx.edges_for_batch(_docs(spark, b2)).collect()
        idx.release_batch_cache()
        assert {(r["id_a"], r["id_b"]) for r in edges} == {(1, 3), (2, 3)}
        cols = set(spark.table(idx.commits).columns)
        assert cols == {"b", "batch"}

        # appends keep working after migration; both batches gate
        idx.append(_docs(spark, b2), batch=1)
        committed = {
            r["b"] for r in spark.table(idx.commits).select("b").collect()
        }
        assert committed == {0, 1}

        # an EMPTY legacy table (exists, zero rows) migrates too
        spark.sql(f"DROP TABLE {idx.commits}")
        spark.createDataFrame([], "batch bigint").write.mode(
            "overwrite"
        ).format("parquet").saveAsTable(idx.commits)
        idx._ensure_commits_layout()
        assert not spark.catalog.tableExists(idx.commits) or (
            spark.table(idx.commits).count() == 0
        )
    finally:
        idx.drop()
        spark.catalog.clearCache()


def test_legacy_commits_migration_crash_windows(spark):
    """r10 ADVICE (medium): the migration is WRITE-THEN-SWAP, so
    neither crash window can lose committed markers (a lost commits
    table makes the whole index read as empty — markers gate reads).
    (a) crash after the temp write, before the legacy drop: re-entry
        must rebuild from the still-authoritative legacy table, never
        trust a possibly-partial temp;
    (b) crash after the drop, before the rename: re-entry must finish
        the swap by renaming the completed temp into place."""
    idx = ShingleIndex(spark, "legcrash")
    idx.drop()
    tmp = f"{idx.commits}__migrate"
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    try:
        # (a) legacy table + a PARTIAL temp (wrong marker) both exist
        spark.createDataFrame(
            [(0,), (1,)], "batch bigint"
        ).write.format("parquet").saveAsTable(idx.commits)
        spark.createDataFrame(
            [(99, 99)], "b bigint, batch bigint"
        ).write.partitionBy("batch").format("parquet").saveAsTable(tmp)
        idx._ensure_commits_layout()
        got = {
            r["b"] for r in spark.table(idx.commits).select("b").collect()
        }
        assert got == {0, 1}  # from legacy; the partial temp discarded
        assert not spark.catalog.tableExists(tmp)

        # (b) only the temp exists (post-drop, pre-rename crash)
        spark.sql(f"ALTER TABLE {idx.commits} RENAME TO {tmp}")
        assert not spark.catalog.tableExists(idx.commits)
        idx._ensure_commits_layout()
        assert spark.catalog.tableExists(idx.commits)
        got = {
            r["b"] for r in spark.table(idx.commits).select("b").collect()
        }
        assert got == {0, 1}
        assert not spark.catalog.tableExists(tmp)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tmp}")
        idx.drop()
        spark.catalog.clearCache()

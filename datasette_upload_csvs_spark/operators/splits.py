"""Leakage-safe train/val split assignment, stable under corpus growth.

split_cluster_safe (queries.py) keys the split on the near-dup CLUSTER
id so near-duplicates never straddle the split — but it recomputes
clusters from scratch, and a full recompute after an append can flip
an existing cluster's min-id and silently migrate already-assigned
documents train↔val: exactly the eval contamination the split exists
to prevent.

This module adds the incremental contract a growing corpus needs:

- ``assign_splits(docs)``  — full recompute; emits
  (doc_id, cluster_id, split, bridged=false).
- ``append_splits(prev, docs)`` — incremental; every row of ``prev``
  is returned **unchanged** (the stability guarantee: an assigned
  document's split label is frozen forever), and only documents
  absent from ``prev`` receive new rows.

Append semantics (deterministic, engine-portable):

- Candidate generation touches only pairs with ≥1 NEW endpoint: the
  corpus posting lists are semi-joined to the batch docs' shingles
  BEFORE pair expansion (dedup.ngram_jaccard_pairs restrict_to_ids),
  so expansion + pair aggregation are O(batch × bucket), never
  O(corpus²); only the document-frequency count still scans the
  corpus postings once (counts over hash longs — the part a 100 TB
  deployment replaces with the maintained index below). The
  document-frequency cap (``max_df``) is computed over the full
  corpus, same frequent-item cut + exact-Jaccard verify as
  dedup.ngram_jaccard_pairs.
- A new doc connected (directly or through other new docs) to ≥1
  previously-assigned cluster ADOPTS the split of the linked cluster
  with the smallest cluster_id, and inherits that cluster_id. Old
  clusters bridged by a new doc keep their existing labels — merging
  them would migrate old docs, which the contract forbids; instead
  the new row is flagged ``bridged=true`` (it is near >1 old cluster,
  possibly on both sides of the split) so a hygiene-sensitive
  pipeline can quarantine it. The flag is TRANSITIVE across appends:
  a new doc whose component links any previously-bridged doc is also
  flagged, even when it touches only one anchor cluster — otherwise
  a later batch could attach to a known leakage bridge unflagged.
- New docs reachable only from new docs form fresh clusters keyed by
  min new doc_id; membership is the same md5(cluster_id) rule as
  split_cluster_safe (first hex digit in {0,1,2} → val).

At 100 TB the full-corpus shingle index would be maintained
incrementally (a managed table keyed by shingle) rather than rebuilt;
the candidate cut and adoption rules are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datasette_upload_csvs_spark.operators.graph import connected_components

VAL_HEX = ("0", "1", "2")


def _split_of(cluster_col) -> F.Column:
    """md5-first-hex-digit membership — identical to split_cluster_safe."""
    return F.when(
        F.substring(F.md5(cluster_col.cast("string")), 1, 1).isin(*VAL_HEX),
        F.lit("val"),
    ).otherwise(F.lit("train"))


def assign_splits(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    max_df: int = 20,
) -> DataFrame:
    """(doc_id, cluster_id, split, bridged) for every document.

    Full recompute: capped-edge near-dup clusters (the dedup_groups
    pipeline), split keyed on cluster id. ``bridged`` is always false
    here — bridging only exists under append.
    """
    from datasette_upload_csvs_spark.operators.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(
        docs, text_col, id_col, threshold=threshold, max_df=max_df
    ).select("id_a", "id_b")
    cc = connected_components(pairs)
    g = F.coalesce("component", id_col)
    return (
        docs.select(id_col)
        .join(cc, F.col(id_col) == F.col("vertex"), "left")
        .select(
            F.col(id_col).alias("doc_id"),
            g.alias("cluster_id"),
            _split_of(g).alias("split"),
            F.lit(False).alias("bridged"),
        )
    )


def _incremental_edges(
    docs: DataFrame,
    new_ids: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
    max_df: int,
) -> DataFrame:
    """Verified near-dup edges (id_a, id_b) with ≥1 NEW endpoint.

    Delegates to dedup.ngram_jaccard_pairs(max_df=…,
    restrict_to_ids=new_ids) — ONE implementation of the capped
    candidate recipe (hash shingles, counts-only df window, map-side
    pair expansion, PPJoin count prune), so fixes to the dedup path
    apply here automatically; the restriction keeps only pairs with
    a new endpoint, making per-batch work O(batch × bucket). The
    capped branch persists its hash-set frame; callers running many
    jobs clearCache between them (same contract as the dedup ops)."""
    from datasette_upload_csvs_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        docs,
        text_col,
        id_col,
        threshold=threshold,
        max_df=max_df,
        restrict_to_ids=new_ids,
    ).select("id_a", "id_b")


def append_splits(
    prev: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    max_df: int = 20,
    edges: DataFrame | None = None,
) -> DataFrame:
    """Extend ``prev`` assignments to the grown corpus ``docs``.

    Stability contract: the returned DataFrame contains every row of
    ``prev`` byte-identical, plus one new row per document of ``docs``
    not present in ``prev``. No existing document ever changes
    cluster_id or split.

    ``edges`` (optional): pre-computed verified near-dup edges
    (id_a, id_b) with ≥1 new endpoint — e.g. from a maintained
    ShingleIndex (edges_for_batch), in which case ``docs`` may be
    JUST the new batch and the corpus text is never re-read or
    re-shingled (the 100 TB path; see append_splits_from_index).
    When omitted, edges come from a corpus rescan via
    dedup.ngram_jaccard_pairs(restrict_to_ids=new). The caller owns
    threshold/max_df consistency between the edge source and the
    labels already frozen in ``prev``."""
    prev_cols = prev.select("doc_id", "cluster_id", "split", "bridged")
    new_ids = docs.select(F.col(id_col)).join(
        prev_cols.select(F.col("doc_id").alias(id_col)), on=id_col, how="left_anti"
    )
    if edges is None:
        edges = _incremental_edges(
            docs, new_ids, text_col, id_col, threshold, max_df
        )
    else:
        edges = edges.select("id_a", "id_b")
    cc = connected_components(edges)

    # per incremental component: the anchor = smallest previously
    # assigned cluster reachable; its split is adopted wholesale.
    anchors = (
        cc.join(prev_cols, cc["vertex"] == prev_cols["doc_id"])
        .groupBy("component")
        .agg(
            F.min("cluster_id").alias("anchor_cluster"),
            F.min_by("split", "cluster_id").alias("anchor_split"),
            F.count_distinct("cluster_id").alias("n_anchor_clusters"),
            # transitive quarantine: linking through a doc that was
            # itself flagged bridged inherits the flag — otherwise a
            # later append could attach new docs to a known train/val
            # leakage bridge with bridged=false
            F.max(F.col("bridged")).alias("anchor_bridged"),
        )
    )

    comp_of_new = cc.join(
        new_ids.select(F.col(id_col).alias("vertex")), "vertex", "left_semi"
    )
    g = F.coalesce("anchor_cluster", "component", F.col(id_col))
    new_rows = (
        new_ids.join(
            comp_of_new, new_ids[id_col] == comp_of_new["vertex"], "left"
        )
        .join(anchors, "component", "left")
        .select(
            F.col(id_col).alias("doc_id"),
            g.alias("cluster_id"),
            F.coalesce("anchor_split", _split_of(g)).alias("split"),
            (
                (F.coalesce("n_anchor_clusters", F.lit(0)) >= 2)
                | F.coalesce("anchor_bridged", F.lit(False))
            ).alias("bridged"),
        )
    )
    return prev_cols.unionByName(new_rows)


def append_splits_from_index(
    prev: DataFrame,
    index,
    new_docs: DataFrame,
    batch: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    max_df: int = 20,
) -> DataFrame:
    """Incremental split assignment backed by a maintained
    ShingleIndex — the end-to-end 100 TB append path: ONE
    tokenize/hash pass over the new batch, ZERO re-reads of corpus
    text (tests/test_splits_index.py pins the returned plan free of
    any prior batch's document scan).

    Runs the index's documented order: edges_for_batch(new_docs)
    against the committed corpus + the batch itself, THEN
    index.append(new_docs, batch). The returned assignments are
    output-equal to append_splits(prev, full_corpus) because
    edges_for_batch is output-equivalent to the rescan path
    (tests/test_shingle_index.py). The edge frame is EAGERLY
    materialized (localCheckpoint) before the append: edges_for_batch
    reads the index tables the append then mutates, so a lazy edge
    plan evaluated after the append would double-count the batch in
    df — lineage truncation removes the hazard entirely (no
    recompute-after-eviction path, unlike persist)."""
    edges = index.edges_for_batch(
        new_docs,
        threshold=threshold,
        max_df=max_df,
        text_col=text_col,
        id_col=id_col,
    ).localCheckpoint(eager=True)
    index.release_batch_cache()  # edges materialized — free the frames
    out = append_splits(
        prev, new_docs, text_col, id_col, threshold, max_df, edges=edges
    )
    index.append(new_docs, batch=batch, text_col=text_col, id_col=id_col)
    return out

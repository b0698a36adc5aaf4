"""Maintained shingle index: the managed-table form of the capped
near-dup candidate stage, so corpus APPENDS never rescan old text.

The capped recipe (dedup.ngram_jaccard_pairs) recomputes the
(id, shingle-hash) postings and the document-frequency window from
the full corpus on every call — fine for one-shot jobs, wrong for a
growing 100 TB corpus where each ingest batch is a fraction of a
percent of the text. This module keeps that state as three
append-only managed tables and answers "edges touching this batch"
reading ONLY index rows selected by the batch's own shingles:

- ``<name>_postings`` — (shingle bigint, doc_id bigint), bucketed
  AND sorted by shingle: the partner lookup is a bucket-pruned scan,
  and a bucketed join on shingle pays no shuffle on the index side.
- ``<name>_sets`` — (doc_id, sh array<bigint>), bucketed by doc_id:
  the exact-Jaccard verify fetches full hash sets for the (batch-
  scale) partner ids without re-deriving them from text.
- ``<name>_df`` — (shingle, cnt, batch): per-batch shingle document
  frequencies. Total df = SUM(cnt) per shingle — an aggregation over
  the COMPACT sidecar (distinct shingles per batch), not the
  postings, and only for the batch's own shingles (broadcast
  semi-join). Append-only writes keep every ingest transactional at
  the file level; a compaction job may fold old batches at leisure.

``edges_for_batch(new_docs)`` is output-equivalent to
``dedup.ngram_jaccard_pairs(full_corpus, max_df=…,
restrict_to_ids=new_ids)`` — same hash shingles
(dedup._shingle_hashes), same full-corpus df cap, same exact
verify — pinned by tests/test_shingle_index.py on multi-append
corpora. Per-batch cost: O(batch shingles) index lookups +
O(Σ C(df, 2) over batch-touching rare shingles) candidate structs.
Nothing scales with the old corpus except the bucket-pruned index
reads.

Reference parity note: the reference engine has no incremental
index; this is the Spark-native scale path for the mandated dedup
family (SURVEY §2 B37)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datasette_upload_csvs_spark.operators.dedup import (
    _doclist_pair_structs,
    _shingle_hashes,
)


class ShingleIndex:
    def __init__(
        self,
        spark: SparkSession,
        name: str,
        n: int = 3,
        num_buckets: int = 8,
    ):
        self.spark = spark
        self.name = name
        self.n = n
        self.num_buckets = num_buckets
        self.postings = f"{name}_postings"
        self.sets = f"{name}_sets"
        self.df_tab = f"{name}_df"

    # ---------------------------------------------------------- build
    def _batch_frames(self, docs, text_col, id_col):
        sets = docs.select(
            F.col(id_col).alias("doc_id"),
            _shingle_hashes(F.col(text_col), self.n).alias("sh"),
        )
        postings = sets.select(
            "doc_id", F.explode("sh").alias("shingle")
        ).select("shingle", "doc_id")
        return sets, postings

    def append(
        self,
        docs: DataFrame,
        batch: int,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> None:
        """Add a batch of NEW documents to the index (caller
        guarantees ids unseen — same contract as append_splits)."""
        sets, postings = self._batch_frames(docs, text_col, id_col)
        exists = self.spark.catalog.tableExists(self.postings)
        mode = "append" if exists else "errorifexists"
        (
            postings.write.mode(mode)
            .bucketBy(self.num_buckets, "shingle")
            .sortBy("shingle")
            .format("parquet")
            .saveAsTable(self.postings)
        )
        (
            sets.write.mode(mode)
            .bucketBy(self.num_buckets, "doc_id")
            .format("parquet")
            .saveAsTable(self.sets)
        )
        (
            postings.groupBy("shingle")
            .agg(F.count("*").alias("cnt"))
            .withColumn("batch", F.lit(batch).cast("bigint"))
            .write.mode(mode)
            .format("parquet")
            .saveAsTable(self.df_tab)
        )

    # ---------------------------------------------------------- query
    def edges_for_batch(
        self,
        new_docs: DataFrame,
        threshold: float = 0.7,
        max_df: int = 20,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> DataFrame:
        """Verified near-dup edges (id_a < id_b, jaccard) with ≥1
        endpoint in ``new_docs``, against the indexed corpus PLUS the
        batch itself. Call BEFORE append(new_docs): the index holds
        the prior corpus; batch-internal pairs come from the batch
        frames in this plan.

        df cap semantics match the one-shot capped path: a shingle's
        document frequency counts the WHOLE grown corpus (sidecar
        sum + batch count); candidate pairs come only from shingles
        with df ≤ max_df; every candidate is exact-verified over the
        full hash sets, so emitted similarities are never
        approximate.

        Caching contract (same as the dedup operators): the batch
        frames persist and the returned plan references them; callers
        running many jobs spark.catalog.clearCache() between them."""
        spark = self.spark
        new_sets, new_postings = self._batch_frames(
            new_docs, text_col, id_col
        )
        new_sets = new_sets.persist()

        # batch shingles with their in-batch counts — batch-sized,
        # broadcastable; every shared shingle of an output pair is
        # one of these (the pair has a new endpoint)
        batch_sh = (
            new_postings.groupBy("shingle")
            .agg(F.count("*").alias("cnt_new"))
            .persist()
        )

        # first batch: no index yet — the batch is the whole corpus
        indexed = spark.catalog.tableExists(self.df_tab)

        # full-corpus df for exactly those shingles: sidecar rows are
        # (shingle, cnt, batch); the broadcast join prunes the scan
        if indexed:
            df_old = (
                spark.table(self.df_tab)
                .join(F.broadcast(batch_sh.select("shingle")), "shingle")
                .groupBy("shingle")
                .agg(F.sum("cnt").alias("cnt_old"))
            )
        else:
            df_old = batch_sh.select(
                "shingle", F.lit(None).cast("bigint").alias("cnt_old")
            ).limit(0)
        rare = (
            # df_old is an aggregate over broadcast-pruned sidecar
            # rows — ≤ |batch shingles| rows, broadcast it so the
            # static plan never sorts/shuffles for this join
            batch_sh.join(F.broadcast(df_old), "shingle", "left")
            .select(
                "shingle",
                (
                    F.col("cnt_new") + F.coalesce("cnt_old", F.lit(0))
                ).alias("df"),
            )
            .filter(F.col("df") <= max_df)
            .select("shingle")
        )

        # partner postings: index rows for rare batch shingles (the
        # broadcast keeps the postings side shuffle-free) + the
        # batch's own postings for those shingles
        all_post = new_postings.join(F.broadcast(rare), "shingle")
        if indexed:
            all_post = spark.table(self.postings).join(
                F.broadcast(rare), "shingle"
            ).unionByName(all_post)
        new_ids = new_sets.select(F.col("doc_id").alias("_nid"))

        # pair expansion per rare shingle (≤ C(max_df, 2) structs),
        # then keep pairs with ≥1 new endpoint and dedup
        grouped = all_post.groupBy("shingle").agg(
            F.collect_list("doc_id").alias("ds")
        )
        cand = (
            grouped.select(
                F.explode(_doclist_pair_structs(F.col("ds"))).alias("p")
            )
            .select("p.id_a", "p.id_b")
            .distinct()
        )
        cand = (
            cand.join(
                F.broadcast(new_ids.withColumnRenamed("_nid", "id_a")),
                "id_a",
                "left_semi",
            )
            .unionByName(
                cand.join(
                    F.broadcast(
                        new_ids.withColumnRenamed("_nid", "id_b")
                    ),
                    "id_b",
                    "left_semi",
                )
            )
            .distinct()
        )

        # exact verify over full hash sets: new endpoints read the
        # in-plan batch frame, old endpoints the sets table. The
        # candidate side is batch-scale — BROADCAST it through both
        # lookups so the corpus-sized sets relation is only ever
        # scanned map-side, never exchanged.
        all_sets = new_sets
        if indexed:
            all_sets = spark.table(self.sets).unionByName(new_sets)
        sa = all_sets.select(
            F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")
        )
        sb = all_sets.select(
            F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")
        )
        half = sa.join(F.broadcast(cand), "id_a")
        both = sb.join(
            F.broadcast(half.select("id_a", "id_b", "sh_a")), "id_b"
        )
        shared = F.size(F.array_intersect("sh_a", "sh_b"))
        jac = shared.cast("double") / (
            F.size("sh_a") + F.size("sh_b") - shared
        ).cast("double")
        return (
            both.select("id_a", "id_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold)
        )

    def drop(self) -> None:
        for t in (self.postings, self.sets, self.df_tab):
            self.spark.sql(f"DROP TABLE IF EXISTS {t}")

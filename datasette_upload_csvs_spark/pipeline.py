"""End-to-end corpus curation: the composite LLM-data pipeline.

One call chains the engine's operators the way a training-data run
does: exact dedup → near-dup removal (MinHash-LSH) → repetition
filter (Gopher-style) → quality filter → language tag →
deterministic train/val split → stats. Every stage is
a DataFrame transformation; nothing materializes until the final
write/count, so Catalyst optimizes across stage boundaries (e.g. the
quality filter's token array reuses the tokenizer expression the
lang-id stage needs — one pass, not two).

Scale notes: the only heavy shuffles are the two dedup joins (content
digest; LSH band buckets). Quality/lang/split are map-side. The
output is hash-partitionable by split for downstream sharding.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datasette_upload_csvs_spark.operators import curation, dedup, graph, textstats


@dataclass
class CurationStats:
    n_input: int
    n_after_exact_dedup: int
    n_after_near_dedup: int
    n_after_repetition: int
    n_after_quality: int
    n_train: int
    n_val: int


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    near_dup_threshold: float = 0.7,
    val_fraction_hex: tuple[str, ...] = ("0", "1", "2"),
) -> tuple[DataFrame, CurationStats]:
    """Returns (curated DataFrame with split/lang/quality columns,
    stage-by-stage stats)."""
    n_input = docs.count()

    # 1. exact dedup (digest shuffle only)
    exact = dedup.dedup_exact(docs, text_col, id_col)
    n_exact = exact.count()

    # 2. near-dup removal, cluster-aware: pair lists under-dedup
    # transitive clusters (edges (A,C),(B,C) alone would keep both A
    # and B though A~B~C is one group), so resolve pairs to connected
    # components and keep exactly the canonical (min-id) doc of each.
    pairs = dedup.minhash_near_dup_pairs(
        exact, text_col, id_col, threshold=near_dup_threshold
    )
    cc = graph.connected_components(pairs.select("id_a", "id_b"))
    losers = cc.filter(F.col("vertex") != F.col("component")).select(
        F.col("vertex").alias(id_col)
    )
    deduped = exact.join(losers, id_col, "left_anti")
    n_near = deduped.count()

    # 2.5 repetition cut (Gopher A1.1: template spam shows up as
    # dup-word / top-word / dup-bigram dominance, orthogonal to the
    # stopword/length quality rules below). Doc-keyed aggregation —
    # shares the shuffle key the dedup stages already used.
    rep_keep = curation.repetition_stats(deduped, text_col, id_col).filter(
        F.col("keep")
    ).select(id_col)
    deduped = deduped.join(rep_keep, id_col, "left_semi")
    n_repetition = deduped.count()

    # 3. quality + language annotation (single map-side pass each)
    quality = textstats.quality_scores(deduped, text_col, id_col).select(
        id_col, "quality_score"
    )
    lang = textstats.language_id(deduped, text_col, id_col).select(
        id_col, "predicted_lang"
    )
    annotated = deduped.join(quality, id_col).join(lang, id_col)
    filtered = annotated.filter(F.col("quality_score") >= min_quality)
    n_quality = filtered.count()

    # 4. deterministic hash split (stable across engines/runs)
    split = F.when(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 1).isin(
            *val_fraction_hex
        ),
        "val",
    ).otherwise("train")
    curated = filtered.withColumn("split", split)
    n_train = curated.filter(F.col("split") == "train").count()
    n_val = curated.filter(F.col("split") == "val").count()

    return curated, CurationStats(
        n_input=n_input,
        n_after_exact_dedup=n_exact,
        n_after_near_dedup=n_near,
        n_after_repetition=n_repetition,
        n_after_quality=n_quality,
        n_train=n_train,
        n_val=n_val,
    )

"""Arrow/numpy fast path for wide-vector similarity scoring.

The Catalyst-expression cosine (functions/vector.py) keeps every
registry entry oracle-comparable, but Spark evaluates higher-order
functions (zip_with/aggregate) INTERPRETED, outside whole-stage
codegen — measured on this host at ~0.3 ms per row for 16 cosines
over dim-64 vectors (PLANS_r06.md §5c). For bulk scoring that is the
ceiling, not the shuffle. This module is the production fast path:
the same reductions as BLAS matmuls over Arrow batches via
mapInPandas — one numpy `V @ Q.T` per batch replaces
rows × queries × dim interpreted lambda steps.

Semantics are pinned to the expression path by
tests/test_similarity_arrow.py (same neighbors, scores within 1e-9
— numpy's pairwise summation differs from the fold's left-to-right
order only at the last ulp). Registry entries keep the expression
form because the DuckDB oracle mirrors it bit-for-bit; a production
deployment swaps this module in when the vector tier dominates.

Partition contract: queries/anchors ride the task closure (a few KB
— same envelope as the broadcast frames they replace); the corpus is
streamed batch-by-batch, never collected.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def _collect_query_matrix(
    emb: DataFrame, query_ids: list[int], id_col: str, vec_col: str
) -> tuple[np.ndarray, np.ndarray]:
    """(ids[Q], unit-normalized vectors[Q, d]) for a small query set —
    the one driver-side collect, same size as the broadcast frame the
    expression path builds."""
    rows = (
        emb.filter(F.col(id_col).isin([int(q) for q in query_ids]))
        .select(id_col, vec_col)
        .collect()
    )
    rows.sort(key=lambda r: r[0])
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    q = np.array([list(r[1]) for r in rows], dtype=np.float64)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return ids, q


def max_cosine_arrow(
    emb: DataFrame,
    query_ids: list[int],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    passthrough: list[str] | None = None,
) -> DataFrame:
    """(id, [passthrough...], max_sim): each corpus vector's max
    cosine against the query set — the decontamination-screen
    reduction (semantic_decontamination's hot loop) as one matmul per
    batch. Query members are excluded from the output like the
    registry entry excludes them. ``passthrough`` columns (e.g. a
    label) ride the Arrow batch unchanged, saving the corpus-sized
    rejoin a separate lookup would cost."""
    qids, qmat = _collect_query_matrix(emb, query_ids, id_col, vec_col)
    qset = set(int(x) for x in qids)
    extra = list(passthrough or [])
    fields = [StructField(id_col, LongType())]
    for c in extra:
        fields.append(emb.schema[c])
    fields.append(StructField("max_sim", DoubleType()))
    schema = StructType(fields)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mask = ~pdf[id_col].isin(qset)
            if not mask.any():
                continue
            sub = pdf[mask]
            v = np.array(list(sub[vec_col]), dtype=np.float64)
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            sims = v @ qmat.T  # (B, Q)
            out = {id_col: sub[id_col].values}
            for c in extra:
                out[c] = sub[c].values
            out["max_sim"] = sims.max(axis=1)
            yield pd.DataFrame(out)

    return emb.select(id_col, *extra, vec_col).mapInPandas(score, schema)


def assign_sqdist_arrow(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """(id, v, cid, d2): nearest centroid per vector by squared L2 —
    the Arrow twin of kmeans.assign. One matmul per batch via the
    ||v−c||² = ||v||² − 2 v·c + ||c||² expansion; ties go to the
    lower cid (argmin on the cid-ordered distance matrix). Centroids
    are collected to a k×dim numpy array (same bytes as the
    broadcast frame the expression path ships)."""
    from pyspark.sql.types import ArrayType, IntegerType

    crows = sorted(centroids.collect(), key=lambda r: r["cid"])
    cids = np.array([r["cid"] for r in crows], dtype=np.int32)
    cmat = np.array([list(r["c"]) for r in crows], dtype=np.float64)
    cnorm2 = (cmat * cmat).sum(axis=1)
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField(vec_col, ArrayType(DoubleType())),
            StructField("cid", IntegerType()),
            StructField("d2", DoubleType()),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array(list(pdf[vec_col]), dtype=np.float64)
            d2 = (
                (v * v).sum(axis=1, keepdims=True)
                - 2.0 * (v @ cmat.T)
                + cnorm2[None, :]
            )
            best = d2.argmin(axis=1)  # first minimum = lowest cid
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    vec_col: pdf[vec_col],
                    "cid": cids[best],
                    "d2": d2[np.arange(len(best)), best],
                }
            )

    return vectors.select(id_col, vec_col).mapInPandas(score, schema)


def topk_batch_arrow(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(query_id, neighbor_id, rank, cos_sim): exact cosine top-k for
    a query SET — the Arrow twin of similarity.brute_force_topk_batch.
    Each Arrow batch emits its local per-query top-k from one matmul
    (argpartition, not a full sort), so the global merge window sees
    ≤ batches × Q × k rows — the same two-level shape as the
    expression path's (query, partition) prune."""
    qids, qmat = _collect_query_matrix(emb, query_ids, id_col, vec_col)
    schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("cos_raw", DoubleType()),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            v = np.array(list(pdf[vec_col]), dtype=np.float64)
            if v.size == 0:
                continue
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            ids = pdf[id_col].values.astype(np.int64)
            sims = v @ qmat.T  # (B, Q)
            out_q, out_n, out_s = [], [], []
            for j, qid in enumerate(qids):
                col = sims[:, j]
                # self-match excluded; non-finite cosines (zero-norm
                # vectors normalize to NaN) masked out BEFORE the
                # partition step — a NaN boundary score would make
                # `colc >= thresh` keep fewer than kk rows and the
                # output columns would disagree in length
                valid = (ids != qid) & np.isfinite(col)
                cand_idx = np.nonzero(valid)[0]
                if cand_idx.size == 0:
                    continue
                kk = min(k, cand_idx.size)
                # Tie-deterministic local cut: a plain argpartition
                # breaks exact-score ties at the kk boundary
                # arbitrarily, which can drop a lower neighbor_id that
                # the final (cos desc, neighbor_id asc) window would
                # rank inside k. Partition first (O(n)), then widen to
                # ALL candidates >= the boundary score and lexsort only
                # that small set so boundary ties keep the lowest ids.
                colc = col[cand_idx]
                if cand_idx.size > kk:
                    part = np.argpartition(-colc, kk - 1)
                    thresh = colc[part[kk - 1]]
                    keep = cand_idx[np.nonzero(colc >= thresh)[0]]
                else:
                    keep = cand_idx
                order = np.lexsort((ids[keep], -col[keep]))
                top = keep[order[:kk]]
                # len(top), not kk: column lengths must always match
                out_q.extend([qid] * len(top))
                out_n.extend(ids[top])
                out_s.extend(col[top])
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.array(out_q, dtype=np.int64),
                        "neighbor_id": np.array(out_n, dtype=np.int64),
                        "cos_raw": np.array(out_s, dtype=np.float64),
                    }
                )

    from pyspark.sql import Window

    pruned = emb.select(id_col, vec_col).mapInPandas(score, schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("neighbor_id").asc()
    )
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("cos_raw", 6).alias("cos_sim"),
        )
    )

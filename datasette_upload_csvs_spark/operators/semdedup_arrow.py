"""Arrow production twin of the SemDeDup registry pipeline.

semdedup_prune / d4_prototype_prune keep their Catalyst-expression
form because the DuckDB oracle mirrors it bit-for-bit; their hot
loops, though, are interpreted higher-order-function cosines
(PLANS_r06.md §5c: ~0.02 ms per dim-64 cosine), paid n×k times in
the quantizer and Σ bucket² times in the within-cluster pass. This
module runs the same algorithm on numpy:

- assignment: one `V @ A.T` per Arrow batch (mapInPandas), argmax
  with the same (cos desc, anchor_id asc) tie-break;
- within-cluster pairwise: one gram matrix per cluster
  (applyInPandas over cluster_id — cluster sizes are bounded by the
  sqrt(n) quantizer, so each group's matrix is small by
  construction), applying the paper's keep-the-outlier rule with
  the registry's exact tie semantics (equal centroid distance
  prunes the larger vec_id).

tests/test_semdedup_arrow.py pins the OUTPUT EQUAL to the registry
entry on the fixtures — same clusters, same rounded centroid
cosines, same pruned set.

Anchor matrix distribution (round-8 VERDICT item 3): the anchors are
shipped as CHUNKED Spark broadcast variables, never a task closure.
A closure re-serializes the full k×dim matrix into every task; a
broadcast moves it once per executor (torrent), and chunking bounds
the DRIVER's peak residency at chunk_size×dim doubles — each chunk
is collected, wrapped in a broadcast, and released before the next
is fetched (completed broadcasts live in the spillable block
manager, not the Python heap). Scoring stays one corpus scan: the
Arrow UDF folds a running (best_cos, best_aid) across chunks in
ascending anchor-id order with a STRICT > update, which is exactly
argmax-with-first-max over the concatenated matrix — assignments
are bit-identical to the single-matrix form (pinned by
tests/test_semdedup_arrow.py with a forced tiny chunk_size).
Driver-memory model at the 100 TB point: n=10^10 vectors, dim 768,
k=⌈√n⌉=10^5 anchors → full matrix 614 MB; with chunk_size=16384 the
driver peak is ~100 MB per chunk (plus spillable block-manager
blocks), and no task ever deserializes more than one chunk beyond
the running fold. Past ~10^11 vectors, swap the √n quantizer for the
sample-trained IVF centroid table (operators/similarity.py), which
this API accepts unchanged as the anchor source.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def anchor_assignment_arrow(
    emb: DataFrame,
    k: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    chunk_size: int = 16384,
) -> DataFrame:
    """(vec_id, cluster_id, c2c, v): nearest-anchor assignment by max
    cosine against the k smallest-id vectors, k = max(32,
    ceil(sqrt(n))) when not given — the registry quantizer, one
    matmul per batch per anchor chunk.

    Anchors ship as chunked BROADCAST variables (see module
    docstring): driver peak residency is one chunk_size×dim matrix;
    tasks deserialize each chunk once per executor, not per task.
    The cross-chunk fold (ascending anchor ids, strict > update) is
    exactly argmax-with-first-max over the concatenated matrix, so
    assignments are bit-identical for any chunk_size."""
    if k is None:
        n = emb.count()
        k = max(32, int(np.ceil(np.sqrt(n))))
    sc = emb.sparkSession.sparkContext
    anchors_df = emb.filter(F.col(id_col) < k).select(id_col, vec_col)
    chunks = []
    lo = 0
    while lo < k:
        hi = min(lo + chunk_size, k)
        sel = anchors_df if k <= chunk_size else anchors_df.filter(
            (F.col(id_col) >= lo) & (F.col(id_col) < hi)
        )
        arows = sel.collect()
        arows.sort(key=lambda r: r[0])
        if arows:
            aids = np.array([r[0] for r in arows], dtype=np.int64)
            amat = np.array([list(r[1]) for r in arows], dtype=np.float64)
            amat /= np.linalg.norm(amat, axis=1, keepdims=True)
            # broadcast, then drop the local reference: completed
            # broadcasts live in the (spillable) block manager, so
            # the Python-heap peak stays one chunk
            chunks.append(sc.broadcast((aids, amat)))
            del aids, amat, arows
        lo = hi
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("cluster_id", LongType()),
            StructField("c2c", DoubleType()),
            StructField("v", ArrayType(DoubleType())),
        ]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array(list(pdf[vec_col]), dtype=np.float64)
            vn = v / np.linalg.norm(v, axis=1, keepdims=True)
            best_cos = None
            best_aid = None
            for bc in chunks:  # ascending anchor-id order
                aids, amat = bc.value
                sims = vn @ amat.T  # chunk is aid-ascending, so the
                bi = sims.argmax(axis=1)  # first max = lowest aid
                bcos = sims[np.arange(len(bi)), bi]
                baid = aids[bi]
                if best_cos is None:
                    best_cos, best_aid = bcos, baid
                else:
                    # STRICT >: an exact tie keeps the earlier chunk's
                    # (lower) anchor id — the single-matrix argmax rule
                    upd = bcos > best_cos
                    best_cos = np.where(upd, bcos, best_cos)
                    best_aid = np.where(upd, baid, best_aid)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "cluster_id": best_aid,
                    "c2c": best_cos,
                    "v": list(v),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(assign, schema)


def anchor_assignment_two_level(
    emb: DataFrame,
    k: int | None = None,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, cluster_id, c2c, v) — two-level nearest-anchor
    assignment with NO driver-side anchor matrix at any k (the
    round-8 verdict's suggested shape past the chunked-broadcast
    ceiling): ⌈√k⌉ COARSE anchors route vectors to cells, and the k
    FINE anchors live in a distributed cell table joined by cell id.

    Stages (all sizes bounded independently of k·dim):
      1. coarse matrix = the ⌈√k⌉ smallest-id vectors — the only
         collected object, √k×dim (2 MB at k=10⁵, dim 768);
      2. fine-anchor routing: one Arrow pass over the k anchors
         assigns each to its nearest coarse cell; cells are grouped
         (coarse_id → [fine anchors]), ~√k anchors per cell;
      3. every vector probes its n_probe nearest coarse cells
         (map-only against the tiny coarse broadcast), then a
         COGROUP on coarse_id meets each cell's probing vectors with
         that cell's fine-anchor block — one matmul per cell batch —
         and a final per-vector max (cos desc, anchor_id asc)
         reduces across probes. Shuffle = n·n_probe vector rows plus
         the anchors once; never an n×k broadcast.

    APPROXIMATE by construction: a vector whose true nearest fine
    anchor lives outside its n_probe coarse cells is misassigned —
    the standard IVF trade. With n_probe = #coarse cells the probe
    set is total and the assignment is BIT-IDENTICAL to
    anchor_assignment_arrow (same dots, same tie-breaks) — pinned by
    tests; production picks n_probe ≪ √k. Known limit: one cogroup
    cell's probe batch materializes in executor memory — a severely
    skewed coarse cell wants a finer coarse level, the same knob IVF
    turns."""
    import numpy as np

    if k is None:
        n = emb.count()
        k = max(32, int(np.ceil(np.sqrt(n))))
    ck = max(4, int(np.ceil(np.sqrt(k))))
    n_probe = min(n_probe, ck)
    sc = emb.sparkSession.sparkContext
    crows = emb.filter(F.col(id_col) < ck).select(id_col, vec_col).collect()
    crows.sort(key=lambda r: r[0])
    cids = np.array([r[0] for r in crows], dtype=np.int64)
    cmat = np.array([list(r[1]) for r in crows], dtype=np.float64)
    cmat /= np.linalg.norm(cmat, axis=1, keepdims=True)
    bc = sc.broadcast((cids, cmat))

    route_schema = StructType(
        [
            StructField("anchor_id", LongType()),
            StructField("coarse_id", LongType()),
            StructField("av", ArrayType(DoubleType())),
        ]
    )

    def route(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        aids, amat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array(list(pdf[vec_col]), dtype=np.float64)
            vn = v / np.linalg.norm(v, axis=1, keepdims=True)
            sims = vn @ amat.T
            best = sims.argmax(axis=1)  # first max = lowest coarse id
            yield pd.DataFrame(
                {
                    "anchor_id": pdf[id_col].values,
                    "coarse_id": aids[best],
                    "av": list(vn),  # pre-normalized: cell matmul is the cosine
                }
            )

    cells = (
        emb.filter(F.col(id_col) < k)
        .select(id_col, vec_col)
        .mapInPandas(route, route_schema)
    )

    probe_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("coarse_id", LongType()),
            StructField("v", ArrayType(DoubleType())),
        ]
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        aids, amat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array(list(pdf[vec_col]), dtype=np.float64)
            vn = v / np.linalg.norm(v, axis=1, keepdims=True)
            sims = vn @ amat.T
            # top-n_probe coarse cells, ties to the lower coarse id
            order = np.lexsort(
                (np.broadcast_to(aids, sims.shape), -sims), axis=1
            )[:, :n_probe]
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].values, n_probe),
                    "coarse_id": aids[order].reshape(-1),
                    "v": [
                        row
                        for row in [list(x) for x in v]
                        for _ in range(n_probe)
                    ],
                }
            )

    probes = emb.select(id_col, vec_col).mapInPandas(probe, probe_schema)

    cell_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("cluster_id", LongType()),
            StructField("c2c", DoubleType()),
            StructField("v", ArrayType(DoubleType())),
        ]
    )

    def best_in_cell(pl: pd.DataFrame, pr: pd.DataFrame) -> pd.DataFrame:
        if len(pl) == 0 or len(pr) == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series(dtype="int64"),
                    "cluster_id": pd.Series(dtype="int64"),
                    "c2c": pd.Series(dtype="float64"),
                    "v": pd.Series(dtype=object),
                }
            )
        amat = np.array(list(pr["av"]), dtype=np.float64)
        aids = pr["anchor_id"].values.astype(np.int64)
        o = np.argsort(aids)  # aid-ascending so argmax first-max = lowest
        aids, amat = aids[o], amat[o]
        v = np.array(list(pl["v"]), dtype=np.float64)
        vn = v / np.linalg.norm(v, axis=1, keepdims=True)
        sims = vn @ amat.T
        bi = sims.argmax(axis=1)
        return pd.DataFrame(
            {
                id_col: pl[id_col].values,
                "cluster_id": aids[bi],
                "c2c": sims[np.arange(len(bi)), bi],
                "v": list(pl["v"]),
            }
        )

    per_cell = (
        probes.groupBy("coarse_id")
        .cogroup(cells.groupBy("coarse_id"))
        .applyInPandas(
            lambda left, right: best_in_cell(left, right), cell_schema
        )
    )
    # global reduce across the n_probe cells: max cos, tie → lowest
    # anchor id (struct comparison is lexicographic; -cluster_id
    # inverts the id order so the struct MAX picks the smallest id)
    best = (
        per_cell.groupBy(id_col)
        .agg(
            F.max(
                F.struct(
                    F.col("c2c").alias("c"),
                    (-F.col("cluster_id")).alias("na"),
                    F.col("v").alias("v"),
                )
            ).alias("m")
        )
        .select(
            id_col,
            (-F.col("m.na")).alias("cluster_id"),
            F.col("m.c").alias("c2c"),
            F.col("m.v").alias("v"),
        )
    )
    return best


def semdedup_prune_arrow(
    emb: DataFrame,
    threshold: float = 0.4,
    k: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    chunk_size: int = 16384,
) -> DataFrame:
    """(vec_id, cluster_id, centroid_cos, pruned) — the registry
    semdedup_prune output, computed with one matmul per batch for
    assignment and one gram matrix per cluster for the pairwise
    pass."""
    assigned = anchor_assignment_arrow(emb, k, vec_col, id_col, chunk_size)
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("cluster_id", LongType()),
            StructField("centroid_cos", DoubleType()),
            StructField("pruned", BooleanType()),
        ]
    )

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].values
        c2c = pdf["c2c"].values
        v = np.array(list(pdf["v"]), dtype=np.float64)
        vn = v / np.linalg.norm(v, axis=1, keepdims=True)
        sims = vn @ vn.T
        n = len(ids)
        pruned = np.zeros(n, dtype=bool)
        # pair (a, b), id_a < id_b, cos >= τ: prune the member CLOSER
        # to the centroid (higher c2c); ties prune the larger vec_id
        iu, ju = np.triu_indices(n, 1)
        hit = sims[iu, ju] >= threshold
        a, b = iu[hit], ju[hit]
        # vectorized loser pick: higher c2c loses; exact c2c tie
        # loses the larger vec_id (registry semantics)
        tie = c2c[a] == c2c[b]
        losers = np.where(c2c[a] > c2c[b], a, b)
        losers[tie] = np.where(ids[a[tie]] > ids[b[tie]], a[tie], b[tie])
        pruned[losers] = True
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster_id": pdf["cluster_id"].values,
                "centroid_cos": np.round(c2c, 6),
                "pruned": pruned,
            }
        )

    return assigned.groupBy("cluster_id").applyInPandas(prune, schema)


def d4_prototype_prune_arrow(
    emb: DataFrame,
    drop_num: int = 3,
    drop_den: int = 10,
    k: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    chunk_size: int = 16384,
) -> DataFrame:
    """(vec_id, cluster_id, centroid_cos, proto_rank, kept) — the
    registry d4_prototype_prune output on the Arrow path: the shared
    quantizer assignment, then a per-cluster prototypicality rank
    (c2c desc, vec_id asc) dropping the top drop_num/drop_den
    interior — pure pandas per cluster, no pairwise stage anywhere.
    The cut is exact integer arithmetic (floor(num·n/den)) so it
    matches the oracle's FLOOR((3*cnt)/10.0) bit-for-bit; a float
    fraction (0.3*n) would diverge at exact multiples."""
    from pyspark.sql.types import IntegerType

    assigned = anchor_assignment_arrow(emb, k, vec_col, id_col, chunk_size)
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("cluster_id", LongType()),
            StructField("centroid_cos", DoubleType()),
            StructField("proto_rank", IntegerType()),
            StructField("kept", BooleanType()),
        ]
    )

    def rank(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf.sort_values(
            ["c2c", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        n = len(s)
        ranks = np.arange(1, n + 1)
        cut = (drop_num * n) // drop_den
        return pd.DataFrame(
            {
                id_col: s[id_col].values,
                "cluster_id": s["cluster_id"].values,
                "centroid_cos": np.round(s["c2c"].values, 6),
                "proto_rank": ranks.astype(np.int32),
                "kept": ranks > cut,
            }
        )

    return assigned.groupBy("cluster_id").applyInPandas(rank, schema)

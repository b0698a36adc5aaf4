"""Distributed Lloyd's k-means on array-typed embedding columns.

MLlib-free on purpose: every piece is a DataFrame op the registry's
oracle can mirror, and the plan is exactly what a 1000-executor run
wants — centroids live in a k×dim frame that is BROADCAST each
round (a few KB), assignment is a map-only nested loop whose
distance folds as a JVM expression (no Python), and the recompute is ONE
(cluster, position) hash aggregate over a single corpus scan.

Iteration discipline (same as graph.connected_components): the
centroid frame is localCheckpoint-ed every round so lineage stays
flat, and the per-round inertia read is the one scalar action that
paces the loop — one job per iteration, no per-row driver traffic.

Determinism: seeding takes the k lowest-id vectors; distance is a
positional zip_with/aggregate fold (bit-identical across engines,
so the argmin needs no tolerance; ties go to the lower cluster id);
centroid means and inertia accumulate through decimal(28,14) so
partition order cannot move them.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def seed_centroids(vectors: DataFrame, k: int, id_col: str = "vec_id",
                   vec_col: str = "v") -> DataFrame:
    """(cid int, c array<double>) — the k lowest-id vectors.

    Deterministic and oracle-mirrorable (ORDER BY id LIMIT k); the
    usual production upgrade is k-means|| over a deterministic
    sample, which slots in here without touching the loop.
    """
    return (
        vectors.orderBy(id_col)
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy(id_col)) - 1)
            .cast("int")
            .alias("cid"),
            F.col(vec_col).alias("c"),
        )
    )


def _sqdist(vec_col: str, cent_col: str):
    """Squared L2 as a positional JVM-expression fold — no UDF, and the
    left-to-right accumulation is bit-identical in Spark and DuckDB."""
    return F.aggregate(
        F.zip_with(vec_col, cent_col, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign(vectors: DataFrame, centroids: DataFrame, id_col: str = "vec_id",
           vec_col: str = "v") -> DataFrame:
    """(id, v, cid, d2): nearest centroid per vector, ties to the
    lower cid. Centroids are broadcast; Spark folds the row_number
    argmin into a pre-shuffle WindowGroupLimit."""
    d = vectors.crossJoin(F.broadcast(centroids)).select(
        id_col, vec_col, "cid", _sqdist(vec_col, "c").alias("d2")
    )
    w = Window.partitionBy(id_col).orderBy("d2", "cid")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def cent_pos_agg(asg: DataFrame, vec_col: str = "v") -> DataFrame:
    """(cid, pos, m, cnt, sd2) — the single-corpus-scan Lloyd
    aggregate: per-position decimal-exact means PLUS the
    cluster-level member count and inertia sum smuggled along
    (identical across a cluster's positions, so a cid-level rollup
    reads them back with max() instead of re-scanning the corpus
    through a second assignment subtree)."""
    pos = asg.select("cid", "d2", F.posexplode(vec_col).alias("pos", "x"))
    return pos.groupBy("cid", "pos").agg(
        (
            F.sum(F.col("x").cast("decimal(28,14)")).cast("double")
            / F.count("*")
        ).alias("m"),
        F.count("*").alias("cnt"),
        F.sum(F.col("d2").cast("decimal(28,14)")).alias("sd2"),
    )


class LloydStep(NamedTuple):
    centroids: DataFrame  # (cid, c array<double>) — the UPDATED means
    stats: DataFrame      # (cid, n_members, inertia) under the OLD centroids


def step(vectors: DataFrame, centroids: DataFrame, id_col: str = "vec_id",
         vec_col: str = "v", use_arrow: bool = False) -> LloydStep:
    """One Lloyd iteration from a single corpus scan.

    The (cid, pos) aggregate carries the cluster-level stats too
    (identical across a cluster's positions, read back with max()),
    so stats do NOT re-derive the assignment subtree. The updated
    centroid array is rebuilt from the per-position means with an
    order-pinned collect_list (sorted by pos), never a Python loop.

    use_arrow swaps the interpreted-expression assignment for the
    numpy matmul path (similarity_arrow.assign_sqdist_arrow) — same
    clusters up to fp ties; the recompute aggregate stays decimal-
    exact. For the fully-fused production iteration (partials in the
    same Arrow pass, no posexplode at all) use step_arrow.
    """
    if use_arrow:
        from datasette_upload_csvs_spark.operators.similarity_arrow import (
            assign_sqdist_arrow,
        )

        asg = assign_sqdist_arrow(vectors, centroids, id_col, vec_col)
    else:
        asg = assign(vectors, centroids, id_col, vec_col)
    cent_pos = cent_pos_agg(asg, vec_col)
    new_cent = cent_pos.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda s: s["m"],
        ).alias("c")
    )
    stats = cent_pos.groupBy("cid").agg(
        F.max("cnt").cast("bigint").alias("n_members"),
        F.max("sd2").cast("double").alias("inertia"),
    )
    return LloydStep(new_cent, stats)


def step_arrow(vectors: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id", vec_col: str = "v") -> LloydStep:
    """Fully-fused Arrow Lloyd iteration: one mapInPandas pass emits
    per-batch per-cluster partials (count, Σv vector, Σd²) — k rows
    per Arrow batch instead of rows×dim through the posexplode hash
    aggregate — and the ≤ batches×k partials combine into the k new
    centroids. The combine is a k-row collect (same scalar-gate
    envelope as the per-round inertia read); partials use fp sums,
    so results match step() to ~1e-9 relative rather than exactly —
    the price of the production path, priced and tested.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType, DoubleType, IntegerType, LongType, StructField,
        StructType,
    )

    crows = sorted(centroids.collect(), key=lambda r: r["cid"])
    cids = np.array([r["cid"] for r in crows], dtype=np.int32)
    cmat = np.array([list(r["c"]) for r in crows], dtype=np.float64)
    cnorm2 = (cmat * cmat).sum(axis=1)
    schema = StructType([
        StructField("cid", IntegerType()),
        StructField("cnt", LongType()),
        StructField("sv", ArrayType(DoubleType())),
        StructField("sd2", DoubleType()),
    ])

    def partials(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array(list(pdf[vec_col]), dtype=np.float64)
            d2 = ((v * v).sum(axis=1, keepdims=True)
                  - 2.0 * (v @ cmat.T) + cnorm2[None, :])
            best = d2.argmin(axis=1)
            # vectorized per-cluster partials — no Python loop over k
            # (k grows with sqrt(n) under the registry quantizer)
            cnt = np.bincount(best, minlength=len(cids))
            sv = np.zeros((len(cids), v.shape[1]))
            np.add.at(sv, best, v)
            bd2 = d2[np.arange(len(best)), best]
            sd2 = np.bincount(best, weights=bd2, minlength=len(cids))
            present = np.nonzero(cnt)[0]
            yield pd.DataFrame(
                {
                    "cid": cids[present],
                    "cnt": cnt[present],
                    "sv": [sv[j].tolist() for j in present],
                    "sd2": sd2[present],
                }
            )

    spark = vectors.sparkSession
    part_rows = (
        vectors.select(id_col, vec_col).mapInPandas(partials, schema).collect()
    )
    agg: dict[int, list] = {}
    for r in part_rows:
        a = agg.setdefault(r["cid"], [0, None, 0.0])
        a[0] += r["cnt"]
        sv = np.array(r["sv"], dtype=np.float64)
        a[1] = sv if a[1] is None else a[1] + sv
        a[2] += r["sd2"]
    new_rows = [
        (cid, (a[1] / a[0]).tolist()) for cid, a in sorted(agg.items())
    ]
    stat_rows = [
        (cid, a[0], a[2]) for cid, a in sorted(agg.items())
    ]
    new_cent = spark.createDataFrame(
        new_rows, schema="cid int, c array<double>"
    )
    stats = spark.createDataFrame(
        stat_rows, schema="cid int, n_members bigint, inertia double"
    )
    return LloydStep(new_cent, stats)


class LloydResult(NamedTuple):
    centroids: DataFrame    # final (cid, c)
    assignments: DataFrame  # (id, cid) under the final centroids
    inertia: list[float]    # per-iteration total inertia (monotone ↓)


def lloyd(vectors: DataFrame, k: int = 8, n_iter: int = 3,
          id_col: str = "vec_id", vec_col: str = "v",
          use_arrow: bool = False) -> LloydResult:
    """n_iter Lloyd iterations. Lloyd's guarantee — each assignment
    and each mean update can only lower the objective — makes the
    returned inertia list monotone non-increasing; the test pins it
    (for both assignment backends).
    """
    cent = seed_centroids(vectors, k, id_col, vec_col).localCheckpoint()
    history: list[float] = []
    for _ in range(n_iter):
        if use_arrow:
            new_cent, stats = step_arrow(vectors, cent, id_col, vec_col)
        else:
            new_cent, stats = step(vectors, cent, id_col, vec_col)
        total = stats.agg(
            F.sum(F.col("inertia").cast("decimal(28,14)")).cast("double")
        ).collect()[0][0]
        history.append(float(total or 0.0))
        cent = new_cent.localCheckpoint()  # flat lineage per round
    final_asg = assign(vectors, cent, id_col, vec_col).select(id_col, "cid")
    return LloydResult(cent, final_asg, history)

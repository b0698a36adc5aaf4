"""Distributed power iteration + all-but-the-top embedding cleanup.

The registry's embedding_pca_power_iteration entry is ONE step of
this loop (that entry is oracle-checked; this module is the driver
loop a production run repeats). Mu & Viswanath '18 ("All-but-the-
Top") showed embedding matrices share a large common direction that
hurts cosine retrieval; the fix is: estimate the dominant direction
with power iteration, then project it out of every vector.

Scale shape per iteration: the current direction is a 1-row frame
(dim doubles) broadcast to every task; each vector's dot folds in
codegen; the X'Xv recompute is one dimension-keyed hash aggregate
(dim rows out, map-side combined — never a corpus shuffle). The
direction frame is localCheckpoint-ed per round for flat lineage,
and the per-round norm read is the one scalar job that paces the
loop (same discipline as kmeans.lloyd / graph.connected_components).

Determinism: v0 = 1/sqrt(dim); dots are positional codegen folds;
the per-dimension sums accumulate through decimal(28,14).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot_with(vec_col: str, dir_col: str):
    return F.aggregate(
        F.zip_with(vec_col, dir_col, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


class PowerIterationResult(NamedTuple):
    direction: DataFrame  # 1 row: (u array<double>) — unit norm
    norms: list[float]    # per-iteration |X'Xv| (monotone ↑ for PSD X'X)


def power_iteration(
    vectors: DataFrame, n_iter: int = 3, vec_col: str = "v",
    use_arrow: bool = False,
) -> PowerIterationResult:
    """Dominant right-singular direction of the stacked embedding
    matrix X via v ← X'Xv / |X'Xv|, starting from the uniform
    direction. ||X'X v_k|| is monotone non-decreasing in k (Cauchy-
    Schwarz on the PSD gram operator) — the test pins it.

    use_arrow runs each iteration as one mapInPandas pass emitting a
    SINGLE partial row per Arrow batch (w_partial = Vᵀ(Vu), two
    numpy matmuls), combined on the driver — the same scalar-gate
    envelope as the per-round norm read; matches the expression
    path within the summation-order ulp.
    """
    dim = vectors.select(F.size(vec_col)).first()[0]  # scalar gate
    spark = vectors.sparkSession
    if use_arrow:
        import numpy as np
        import pandas as pd
        from pyspark.sql.types import (
            ArrayType, DoubleType, StructField, StructType,
        )

        uvec = np.full(dim, 1.0 / dim**0.5)
        norms: list[float] = []
        schema = StructType([StructField("wp", ArrayType(DoubleType()))])
        for _ in range(n_iter):
            u_now = uvec  # bind per iteration for the closure

            def partials(batches, _u=u_now):
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    v = np.array(list(pdf[vec_col]), dtype=np.float64)
                    yield pd.DataFrame({"wp": [(v.T @ (v @ _u)).tolist()]})

            parts = (
                vectors.select(vec_col).mapInPandas(partials, schema).collect()
            )
            w = np.zeros(dim)
            for r in parts:
                w += np.array(r["wp"], dtype=np.float64)
            lam = float(np.linalg.norm(w))
            norms.append(lam)
            uvec = w / lam
        u = spark.createDataFrame(
            [(uvec.tolist(),)], schema="u array<double>"
        )
        return PowerIterationResult(u, norms)

    u = spark.range(1).select(
        F.array(*[F.lit(1.0 / dim**0.5) for _ in range(dim)]).alias("u")
    ).localCheckpoint()
    norms = []
    for _ in range(n_iter):
        dots = vectors.crossJoin(F.broadcast(u)).select(
            vec_col, _dot_with(vec_col, "u").alias("dot")
        )
        w = (
            dots.select(F.posexplode(vec_col).alias("pos", "x"), "dot")
            .groupBy("pos")
            .agg(
                F.sum((F.col("x") * F.col("dot")).cast("decimal(28,14)"))
                .cast("double")
                .alias("w")
            )
        )
        lam_w = w.agg(
            F.sqrt(
                F.sum((F.col("w") * F.col("w")).cast("decimal(28,14)")).cast(
                    "double"
                )
            ).alias("l"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))),
                lambda s: s["w"],
            ).alias("wvec"),
        )
        row = lam_w.select(
            "l", F.transform("wvec", lambda x: x / F.col("l")).alias("u")
        ).localCheckpoint()
        norms.append(float(row.select("l").first()[0]))
        u = row.select("u")
    return PowerIterationResult(u, norms)


def remove_common_direction(
    vectors: DataFrame, direction: DataFrame, vec_col: str = "v"
) -> DataFrame:
    """ABTT projection: v' = v − (v·u)u, map-only against the
    broadcast 1-row direction. Adds `<vec_col>_clean`. The dot is
    hoisted to its own column so the per-element lambda multiplies a
    scalar instead of re-folding the whole dot (O(d), not O(d²))."""
    return (
        vectors.crossJoin(F.broadcast(direction))
        .withColumn("_dot", _dot_with(vec_col, "u"))
        .withColumn(
            f"{vec_col}_clean",
            F.zip_with(vec_col, "u", lambda a, b: a - F.col("_dot") * b),
        )
        .drop("u", "_dot")
    )

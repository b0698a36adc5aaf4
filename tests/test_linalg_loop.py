"""Power-iteration loop + ABTT invariants (operators/linalg.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from datasette_upload_csvs_spark.functions.vector import as_double_array
from datasette_upload_csvs_spark.operators import linalg


def _vectors(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )


def test_power_iteration_monotone_and_unit(spark, sf_dir):
    v = _vectors(spark, sf_dir)
    res = linalg.power_iteration(v, n_iter=3)
    assert len(res.norms) == 3
    # ||X'X v_k|| is monotone non-decreasing on the PSD gram operator
    assert res.norms[0] <= res.norms[1] <= res.norms[2]
    assert res.norms[0] > 0
    u = res.direction.first()["u"]
    assert math.isclose(sum(x * x for x in u), 1.0, rel_tol=1e-9)


def test_power_iteration_step_matches_registry(spark, sf_dir):
    """Iteration one of the loop IS the registry entry: same norm and
    same per-dimension loadings."""
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["embedding_pca_power_iteration"](
        spark, sf_dir
    ).collect()
    reg = {r["pos"]: r["loading"] for r in rows}
    reg_norm = rows[0]["gram_norm"]

    v = _vectors(spark, sf_dir)
    res = linalg.power_iteration(v, n_iter=1)
    assert math.isclose(res.norms[0], reg_norm, abs_tol=1e-5)
    u = res.direction.first()["u"]
    # registry pos is 1-based
    assert all(
        math.isclose(u[p - 1], reg[p], abs_tol=1e-5) for p in reg
    )


def test_power_iteration_arrow_matches_expression(spark, sf_dir):
    v = _vectors(spark, sf_dir)
    e = linalg.power_iteration(v, n_iter=2)
    a = linalg.power_iteration(v, n_iter=2, use_arrow=True)
    assert all(
        math.isclose(x, y, rel_tol=1e-9) for x, y in zip(e.norms, a.norms)
    )
    ue = e.direction.first()["u"]
    ua = a.direction.first()["u"]
    assert all(math.isclose(x, y, abs_tol=1e-9) for x, y in zip(ue, ua))
    assert a.norms[0] <= a.norms[1]


def test_abtt_residual_orthogonal(spark, sf_dir):
    v = _vectors(spark, sf_dir)
    res = linalg.power_iteration(v, n_iter=2)
    cleaned = linalg.remove_common_direction(v, res.direction)
    u = res.direction.first()["u"]
    sample = cleaned.orderBy("vec_id").limit(20).collect()
    for r in sample:
        resid_dot = sum(a * b for a, b in zip(r["v_clean"], u))
        assert abs(resid_dot) < 1e-9
        # projection never increases the norm
        assert sum(x * x for x in r["v_clean"]) <= sum(
            x * x for x in r["v"]
        ) + 1e-12

"""Lloyd loop invariants (operators/kmeans.py) — the properties the
registry entry's single step cannot show: monotone objective descent
across iterations and a consistent final assignment."""

from __future__ import annotations

from pyspark.sql import functions as F

from datasette_upload_csvs_spark.functions.vector import as_double_array
from datasette_upload_csvs_spark.operators import kmeans


def _vectors(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )


def test_lloyd_inertia_monotone(spark, sf_dir):
    v = _vectors(spark, sf_dir)
    res = kmeans.lloyd(v, k=8, n_iter=3)
    assert len(res.inertia) == 3
    # Lloyd's guarantee: every assignment and every mean update can
    # only lower the objective
    assert res.inertia[0] >= res.inertia[1] >= res.inertia[2]
    assert res.inertia[-1] > 0


def test_lloyd_final_assignment_partitions(spark, sf_dir):
    v = _vectors(spark, sf_dir)
    n = v.count()
    res = kmeans.lloyd(v, k=8, n_iter=2)
    asg = res.assignments
    assert asg.count() == n
    assert asg.select("vec_id").distinct().count() == n
    cids = {r["cid"] for r in asg.select("cid").distinct().collect()}
    assert cids <= set(range(8)) and cids
    # centroids exist exactly for the surviving clusters
    assert {r["cid"] for r in res.centroids.select("cid").collect()} == cids


def test_step_matches_registry_entry(spark, sf_dir):
    """The registry's kmeans_lloyd_step IS iteration one of lloyd():
    same inertia total under the seed centroids."""
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["kmeans_lloyd_step"](spark, sf_dir).collect()
    reg_total = sum(r["inertia"] for r in rows)
    v = _vectors(spark, sf_dir)
    res = kmeans.lloyd(v, k=8, n_iter=1)
    assert abs(res.inertia[0] - reg_total) < 1e-4

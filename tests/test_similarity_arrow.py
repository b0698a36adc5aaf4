"""The Arrow/numpy scoring path must agree with the Catalyst
expression path it accelerates (operators/similarity_arrow.py):
same neighbors, scores within the last-ulp summation-order delta."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from datasette_upload_csvs_spark.functions.vector import as_double_array, cosine
from datasette_upload_csvs_spark.operators import similarity, similarity_arrow

QUERIES = [0, 3, 7, 11]


def test_topk_batch_arrow_matches_expression_path(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = similarity.brute_force_topk_batch(emb, QUERIES, k=10).collect()
    arrow = similarity_arrow.topk_batch_arrow(emb, QUERIES, k=10).collect()
    assert len(exact) == len(arrow)

    def by_query(rows):
        d = defaultdict(list)
        for r in rows:
            d[r["query_id"]].append(r)
        for v in d.values():
            v.sort(key=lambda r: r["rank"])
        return d

    e, a = by_query(exact), by_query(arrow)
    assert set(e) == set(a)
    for qid in e:
        # identical score sequence (both round to 6dp pre-output)...
        assert [r["cos_sim"] for r in e[qid]] == [r["cos_sim"] for r in a[qid]]
        # ...and identical neighbor SET (rank swaps only possible
        # between equal rounded scores)
        assert {r["neighbor_id"] for r in e[qid]} == {
            r["neighbor_id"] for r in a[qid]
        }


def test_assign_arrow_matches_expression_path(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    from datasette_upload_csvs_spark.operators import kmeans

    v = emb.select("vec_id", as_double_array(F.col("embedding")).alias("v"))
    cent = kmeans.seed_centroids(v, 8)
    expr = {
        r["vec_id"]: (r["cid"], r["d2"])
        for r in kmeans.assign(v, cent).collect()
    }
    arrow = {
        r["vec_id"]: (r["cid"], r["d2"])
        for r in similarity_arrow.assign_sqdist_arrow(v, cent).collect()
    }
    assert set(expr) == set(arrow)
    # same cluster everywhere (fp ties would be the only escape) and
    # distances within the ||v||²−2v·c+||c||² cancellation envelope
    mismatch = [i for i in expr if expr[i][0] != arrow[i][0]]
    assert not mismatch, mismatch[:5]
    assert all(
        abs(expr[i][1] - arrow[i][1]) < 1e-7 * (1 + expr[i][1]) for i in expr
    )


def test_lloyd_arrow_backend_monotone_and_agrees(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    from datasette_upload_csvs_spark.operators import kmeans

    v = emb.select("vec_id", as_double_array(F.col("embedding")).alias("v"))
    a = kmeans.lloyd(v, k=8, n_iter=2, use_arrow=True)
    e = kmeans.lloyd(v, k=8, n_iter=2, use_arrow=False)
    assert a.inertia[0] >= a.inertia[1]
    assert all(
        abs(x - y) < 1e-6 * (1 + abs(y)) for x, y in zip(a.inertia, e.inertia)
    )


def test_step_arrow_matches_expression_step(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    from datasette_upload_csvs_spark.operators import kmeans

    v = emb.select("vec_id", as_double_array(F.col("embedding")).alias("v"))
    cent = kmeans.seed_centroids(v, 8)
    ea = kmeans.step(v, cent)
    aa = kmeans.step_arrow(v, cent)
    es = {r["cid"]: r for r in ea.stats.collect()}
    as_ = {r["cid"]: r for r in aa.stats.collect()}
    assert set(es) == set(as_)
    for cid in es:
        assert es[cid]["n_members"] == as_[cid]["n_members"]
        assert abs(es[cid]["inertia"] - as_[cid]["inertia"]) < 1e-6 * (
            1 + es[cid]["inertia"]
        )
    ec = {r["cid"]: r["c"] for r in ea.centroids.collect()}
    ac = {r["cid"]: r["c"] for r in aa.centroids.collect()}
    for cid in ec:
        assert all(
            abs(x - y) < 1e-9 for x, y in zip(ec[cid], ac[cid])
        )


def test_max_cosine_arrow_matches_expression_path(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v = emb.select("vec_id", as_double_array(F.col("embedding")).alias("v"))
    b = (
        v.filter(F.col("vec_id").isin(QUERIES))
        .select(F.col("vec_id").alias("bid"), F.col("v").alias("bv"))
    )
    expr = (
        v.join(F.broadcast(b.select("bid")), v.vec_id == F.col("bid"), "left_anti")
        .crossJoin(F.broadcast(b.agg(F.collect_list("bv").alias("bvs"))))
        .select(
            "vec_id",
            F.array_max(
                F.transform("bvs", lambda bv: cosine(F.col("v"), bv))
            ).alias("max_sim"),
        )
        .collect()
    )
    arrow = similarity_arrow.max_cosine_arrow(emb, QUERIES).collect()
    e = {r["vec_id"]: r["max_sim"] for r in expr}
    a = {r["vec_id"]: r["max_sim"] for r in arrow}
    assert set(e) == set(a)
    assert all(abs(e[i] - a[i]) < 1e-9 for i in e)

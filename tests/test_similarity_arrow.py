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

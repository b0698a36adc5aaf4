"""The Arrow SemDeDup twin must reproduce the registry entry's
output EXACTLY on the fixtures (same quantizer, same tie rules)."""

from __future__ import annotations

import __spark_entry__ as entry_mod

from datasette_upload_csvs_spark.operators import semdedup_arrow


def test_semdedup_arrow_equals_registry(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    reg = {
        r["vec_id"]: (r["cluster_id"], r["centroid_cos"], r["pruned"])
        for r in entry_mod.queries()["semdedup_prune"](spark, sf_dir).collect()
    }
    arr = {
        r["vec_id"]: (r["cluster_id"], r["centroid_cos"], r["pruned"])
        for r in semdedup_arrow.semdedup_prune_arrow(emb).collect()
    }
    assert set(reg) == set(arr)
    diff = [i for i in reg if reg[i] != arr[i]]
    assert not diff, [(i, reg[i], arr[i]) for i in diff[:5]]


def test_d4_arrow_equals_registry(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    reg = {
        r["vec_id"]: (
            r["cluster_id"],
            r["centroid_cos"],
            r["proto_rank"],
            r["kept"],
        )
        for r in entry_mod.queries()["d4_prototype_prune"](
            spark, sf_dir
        ).collect()
    }
    arr = {
        r["vec_id"]: (
            r["cluster_id"],
            r["centroid_cos"],
            r["proto_rank"],
            r["kept"],
        )
        for r in semdedup_arrow.d4_prototype_prune_arrow(emb).collect()
    }
    assert set(reg) == set(arr)
    diff = [i for i in reg if reg[i] != arr[i]]
    assert not diff, [(i, reg[i], arr[i]) for i in diff[:5]]


def test_assignment_cluster_sizes_bounded(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    asg = semdedup_arrow.anchor_assignment_arrow(emb)
    sizes = [
        r["c"]
        for r in asg.groupBy("cluster_id").count().withColumnRenamed(
            "count", "c"
        ).collect()
    ]
    assert sum(sizes) == n
    # the sqrt(n) quantizer keeps the largest pairwise matrix small
    assert max(sizes) < n


def test_chunked_anchor_broadcast_bit_identical(spark, sf_dir):
    # round-8 driver-memory fix: anchors ship as chunked broadcasts;
    # a forced tiny chunk_size must produce bit-identical assignments
    # (strict-> fold == argmax-first-max over the concatenated matrix)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    one = {
        r["vec_id"]: (r["cluster_id"], r["c2c"])
        for r in semdedup_arrow.anchor_assignment_arrow(
            emb, chunk_size=1 << 20
        ).collect()
    }
    many = {
        r["vec_id"]: (r["cluster_id"], r["c2c"])
        for r in semdedup_arrow.anchor_assignment_arrow(
            emb, chunk_size=7
        ).collect()
    }
    assert one == many
    pr_one = sorted(
        map(tuple, semdedup_arrow.semdedup_prune_arrow(emb).collect())
    )
    pr_many = sorted(
        map(
            tuple,
            semdedup_arrow.semdedup_prune_arrow(emb, chunk_size=7).collect(),
        )
    )
    assert pr_one == pr_many

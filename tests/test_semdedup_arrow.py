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


def test_two_level_full_probe_bit_identical(spark, sf_dir):
    # with n_probe = #coarse cells the probe set is total, so the
    # two-level assignment must be BIT-IDENTICAL to the single-level
    # argmax (same dots, same tie-breaks) — the exactness anchor the
    # approximate n_probe<ck mode degrades from
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    k = max(32, int(np.ceil(np.sqrt(n))))
    ck = max(4, int(np.ceil(np.sqrt(k))))
    exact = {
        r["vec_id"]: (r["cluster_id"], r["c2c"])
        for r in semdedup_arrow.anchor_assignment_arrow(emb, k=k).collect()
    }
    two = {
        r["vec_id"]: (r["cluster_id"], r["c2c"])
        for r in semdedup_arrow.anchor_assignment_two_level(
            emb, k=k, n_probe=ck
        ).collect()
    }
    assert exact == two


def test_two_level_low_probe_beats_blind_probing(spark, sf_dir):
    # the production regime (n_probe=2 of ~6 cells): agreement with
    # the exact argmax must clearly beat the blind-probe baseline
    # (n_probe/ck = fraction of anchors even visible ≈ 0.33). The
    # fixture embeddings are near-random — the HARDEST routing regime
    # (cf. embedding_anchor_block_pairs' recall discussion) — so the
    # measured 0.59 is the data's ceiling shaping the bar, not the
    # operator's; clustered production embeddings route far better,
    # and the full-probe test above pins exactness.
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        r["vec_id"]: r["cluster_id"]
        for r in semdedup_arrow.anchor_assignment_arrow(emb).collect()
    }
    two = {
        r["vec_id"]: r["cluster_id"]
        for r in semdedup_arrow.anchor_assignment_two_level(
            emb, n_probe=2
        ).collect()
    }
    assert set(exact) == set(two)
    agree = sum(exact[i] == two[i] for i in exact) / len(exact)
    assert agree >= 0.5, agree

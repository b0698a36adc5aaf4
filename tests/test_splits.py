"""Incremental train/val split assignment (operators/splits.py).

The property under test is the round-4 verdict's item 3: appending a
batch of documents must never migrate an already-assigned document
train↔val, even when the append would change the cluster structure a
full recompute sees (bridge documents merging old clusters and
flipping the cluster min-id)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from datasette_upload_csvs_spark.operators import splits


def _md5_split(cluster_id: int) -> str:
    h = hashlib.md5(str(cluster_id).encode()).hexdigest()[0]
    return "val" if h in "012" else "train"


def _corpus(spark):
    """Two planted singleton clusters whose md5 splits DIFFER
    (doc 1 → train, doc 6 → val), plus unique filler docs."""
    assert _md5_split(1) == "train" and _md5_split(6) == "val"
    blk = lambda p, k: " ".join(f"{p}{i}" for i in range(k))
    P, Q, R = blk("p", 10), blk("q", 30), blk("r", 10)
    rows = [(1, f"{P} {Q}"), (6, f"{Q} {R}")]
    rows += [(i, blk(f"f{i}x", 12)) for i in range(20, 40)]
    return spark.createDataFrame(rows, "doc_id long, text string"), P, Q, R


def test_append_freezes_existing_labels(spark):
    """A bridge doc near BOTH old clusters must not migrate either:
    full recompute would merge {1, 6, 100} under min-id 1 and flip
    doc 6 val→train; append keeps doc 6 exactly as assigned."""
    docs1, P, Q, R = _corpus(spark)
    prev = splits.assign_splits(docs1)
    p = {r["doc_id"]: r for r in prev.collect()}
    assert p[1]["split"] == "train" and p[1]["cluster_id"] == 1
    assert p[6]["split"] == "val" and p[6]["cluster_id"] == 6

    # j(bridge, A) = j(bridge, B) ≈ 0.79 ≥ 0.7; j(A, B) ≈ 0.58 < 0.7
    bridge = (100, f"{P} {Q} {R}")
    docs2 = docs1.unionByName(
        spark.createDataFrame([bridge], "doc_id long, text string")
    )

    # a full recompute WOULD migrate doc 6 (the hazard being tested)
    full = {r["doc_id"]: r for r in splits.assign_splits(docs2).collect()}
    assert full[6]["cluster_id"] == 1 and full[6]["split"] == "train"

    out = {r["doc_id"]: r for r in splits.append_splits(prev, docs2).collect()}
    assert len(out) == docs2.count()
    for d, row in p.items():  # stability: every prev row unchanged
        assert (out[d]["cluster_id"], out[d]["split"], out[d]["bridged"]) == (
            row["cluster_id"], row["split"], row["bridged"]
        )
    # the bridge adopts the smallest linked cluster and is flagged
    assert out[100]["cluster_id"] == 1
    assert out[100]["split"] == "train"
    assert out[100]["bridged"] is True


def test_append_adopts_anchor_split_and_keys_fresh_clusters(spark):
    docs1, P, Q, R = _corpus(spark)
    prev = splits.assign_splits(docs1)
    blk = lambda p, k: " ".join(f"{p}{i}" for i in range(k))
    extra = " ".join(f"e{i}" for i in range(2))
    new = [
        # near doc 6 only (29 extra tokens over its 40 → j ≈ 0.93)
        (101, f"{Q} {R} {extra}"),
        # near each other only → fresh cluster keyed by min new id
        (102, blk("z", 40) + " za"),
        (103, blk("z", 40) + " zb"),
        # no neighbors at all → singleton cluster
        (104, blk("s104x", 15)),
    ]
    docs2 = docs1.unionByName(
        spark.createDataFrame(new, "doc_id long, text string")
    )
    out = {r["doc_id"]: r for r in splits.append_splits(prev, docs2).collect()}

    # adoption beats the md5 rule: 101 joins cluster 6 → val
    assert out[101]["cluster_id"] == 6
    assert out[101]["split"] == "val"
    assert out[101]["bridged"] is False

    # fresh all-new cluster: min new id keys it, md5 rule labels it
    assert out[102]["cluster_id"] == 102 and out[103]["cluster_id"] == 102
    assert out[102]["split"] == out[103]["split"] == _md5_split(102)

    # singleton: own id, md5 rule
    assert out[104]["cluster_id"] == 104
    assert out[104]["split"] == _md5_split(104)

    # no near-dup pair straddles the split among non-bridged rows
    both = docs2
    pairs = splits._incremental_edges(
        both,
        both.select("doc_id"),
        "text",
        "doc_id",
        threshold=0.7,
        max_df=20,
    ).collect()
    assert pairs  # the corpus really has edges
    for e in pairs:
        a, b = out[e["id_a"]], out[e["id_b"]]
        if not (a["bridged"] or b["bridged"]):
            assert a["split"] == b["split"]


def test_append_is_idempotent_and_batch_linear(spark):
    """Appending zero new docs is a no-op, and a second append only
    adds the second batch's rows."""
    docs1, *_ = _corpus(spark)
    prev = splits.assign_splits(docs1)
    again = splits.append_splits(prev, docs1)
    assert again.count() == prev.count()
    assert prev.exceptAll(again).count() == 0

    b2 = spark.createDataFrame(
        [(200, "only words nobody else uses anywhere at all today")],
        "doc_id long, text string",
    )
    out = splits.append_splits(prev, docs1.unionByName(b2))
    assert out.count() == prev.count() + 1


def test_bridged_flag_propagates_across_appends(spark):
    """Transitive quarantine: append 1 creates a bridge doc X across
    old clusters 1 (train) and 6 (val) → bridged=true. Append 2 adds
    doc Y near X ONLY — one anchor cluster, but that anchor path runs
    through a known leakage bridge, so Y must inherit bridged=true
    (a hygiene pipeline that quarantines bridged rows must not
    re-admit the leak through one extra hop)."""
    docs1, P, Q, R = _corpus(spark)
    prev = splits.assign_splits(docs1)

    bridge_text = f"{P} {Q} {R}"  # near both 1 and 6
    docs2 = docs1.unionByName(
        spark.createDataFrame(
            [(100, bridge_text)], "doc_id long, text string"
        )
    )
    out2 = splits.append_splits(prev, docs2)
    o2 = {r["doc_id"]: r for r in out2.collect()}
    assert o2[100]["bridged"] is True

    # Y near the bridge doc X ONLY: 15 extra tokens dilute Y below
    # the 0.7 threshold against docs 1 and 6 individually (~0.60)
    # while staying ≥ 0.7 against X (~0.76) — one anchor cluster, so
    # without transitive propagation Y would be bridged=false
    extra = " ".join(f"y{i}" for i in range(15))
    docs3 = docs2.unionByName(
        spark.createDataFrame(
            [(110, f"{bridge_text} {extra}")], "doc_id long, text string"
        )
    )
    edges = splits._incremental_edges(
        docs3,
        docs3.filter(F.col("doc_id") == 110).select("doc_id"),
        "text",
        "doc_id",
        threshold=0.7,
        max_df=20,
    ).collect()
    partners = {e["id_a"] for e in edges} | {e["id_b"] for e in edges}
    assert partners == {100, 110}, partners  # Y touches X and nothing else

    out3 = splits.append_splits(out2, docs3)
    o3 = {r["doc_id"]: r for r in out3.collect()}
    # old rows byte-identical
    assert o3[100]["bridged"] is True
    # the new doc inherits the quarantine flag transitively
    assert o3[110]["bridged"] is True

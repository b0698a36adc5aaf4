"""Parity of connected_components' bounded small-graph fast path
(driver union-find over the collected adjacency) vs the distributed
hash-min + pointer-jumping loop (forced with small_graph_rows=0).
Both must produce component = min reachable vertex id for every
vertex that has an edge. The fast path exists because each
distributed round is a fixed-cost Spark job (~3 s of scheduling for
a few-thousand-row near-dup edge set); labels must be IDENTICAL."""

from __future__ import annotations

import random

from pyspark.sql import functions as F  # noqa: F401

from datasette_upload_csvs_spark.operators import graph


def _labels(df):
    return {r["vertex"]: r["component"] for r in df.collect()}


def _both(spark, edges):
    fast = _labels(graph.connected_components(edges))
    dist = _labels(
        graph.connected_components(edges, small_graph_rows=0)
    )
    return fast, dist


def test_fast_path_parity_random_graph(spark):
    rnd = random.Random(13)
    # ~40 clumps of 3-30 vertices plus random cross-edges inside
    # each clump; vertex ids deliberately non-contiguous
    rows = []
    base = 0
    for _ in range(40):
        k = rnd.randint(3, 30)
        ids = [base + i * 7 for i in range(k)]
        base += k * 7 + rnd.randint(1, 50)
        for i in range(1, k):
            rows.append((ids[rnd.randrange(i)], ids[i]))
        for _ in range(k // 2):
            a, b = rnd.sample(ids, 2)
            rows.append((min(a, b), max(a, b)))
    edges = spark.createDataFrame(rows, "id_a long, id_b long")
    fast, dist = _both(spark, edges)
    assert fast == dist
    # every component label is the min id of its member set
    comps: dict = {}
    for v, c in fast.items():
        comps.setdefault(c, []).append(v)
    for c, members in comps.items():
        assert c == min(members)


def test_fast_path_parity_long_chain(spark):
    # a 300-vertex path in shuffled edge order — the diameter case
    # pointer jumping exists for; the fast path must agree
    ids = list(range(0, 600, 2))
    rnd = random.Random(7)
    rows = [(ids[i], ids[i + 1]) for i in range(len(ids) - 1)]
    rnd.shuffle(rows)
    edges = spark.createDataFrame(rows, "id_a long, id_b long")
    fast, dist = _both(spark, edges)
    assert fast == dist
    assert set(fast.values()) == {0}
    assert len(fast) == len(ids)


def test_fast_path_parity_string_ids(spark):
    rows = [("b", "c"), ("a", "b"), ("x", "y")]
    edges = spark.createDataFrame(rows, "id_a string, id_b string")
    fast, dist = _both(spark, edges)
    assert fast == dist == {
        "a": "a", "b": "a", "c": "a", "x": "x", "y": "x"
    }


def test_fast_path_empty_edges(spark):
    edges = spark.createDataFrame([], "id_a long, id_b long")
    fast, dist = _both(spark, edges)
    assert fast == dist == {}


def test_fast_path_self_loops_and_dups(spark):
    rows = [(1, 1), (1, 2), (2, 1), (2, 3), (9, 9)]
    edges = spark.createDataFrame(rows, "id_a long, id_b long")
    fast, dist = _both(spark, edges)
    assert fast == dist == {1: 1, 2: 1, 3: 1, 9: 9}


def test_byte_gate_routes_wide_string_ids_to_distributed(spark):
    """The id-bytes gate: row count alone under-bounds driver heap
    for wide string ids (ADVICE r13). With a tiny byte budget the
    same small graph must take the distributed loop — and still
    produce identical labels."""
    rows = [("doc-" + "x" * 60 + str(i), "doc-" + "x" * 60 + str(i + 1))
            for i in range(20)]
    edges = spark.createDataFrame(rows, "id_a string, id_b string")
    gated = _labels(
        graph.connected_components(edges, small_graph_id_bytes=100)
    )
    fast = _labels(graph.connected_components(edges))
    assert gated == fast
    assert len(set(gated.values())) == 1

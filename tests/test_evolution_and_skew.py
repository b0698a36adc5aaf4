"""Schema-evolution append (reference alter=True parity) and
skew-mitigation equivalence tests."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from datasette_upload_csvs_spark import ingest
from datasette_upload_csvs_spark import queries as Q
from datasette_upload_csvs_spark.operators import skew


def _w(tmp_path, name, text):
    p = os.path.join(str(tmp_path), name)
    open(p, "w").write(text)
    return p


def test_append_same_schema(spark, tmp_path):
    p1 = _w(tmp_path, "b1.csv", "a,b\n1,x\n2,y\n")
    p2 = _w(tmp_path, "b2.csv", "a,b\n3,z\n")
    ingest.upload_csv(spark, p1, table="evolve_same")
    r = ingest.append_csv(spark, p2, "evolve_same")
    assert r.rows == 1
    rows = {tuple(x) for x in spark.table("evolve_same").collect()}
    assert rows == {(1, "x"), (2, "y"), (3, "z")}


def test_append_with_new_column(spark, tmp_path):
    p1 = _w(tmp_path, "c1.csv", "a,b\n1,x\n")
    p2 = _w(tmp_path, "c2.csv", "a,b,c\n2,y,9\n")
    ingest.upload_csv(spark, p1, table="evolve_add")
    r = ingest.append_csv(spark, p2, "evolve_add")
    df = spark.table("evolve_add")
    assert set(df.columns) == {"a", "b", "c"}
    rows = {tuple(x) for x in df.collect()}
    # old rows read NULL for the added column (alter=True semantics)
    assert rows == {(1, "x", None), (2, "y", 9)}
    assert r.columns == ["a", "b", "c"]


def test_append_with_missing_column(spark, tmp_path):
    p1 = _w(tmp_path, "d1.csv", "a,b\n1,x\n")
    p2 = _w(tmp_path, "d2.csv", "a\n5\n")
    ingest.upload_csv(spark, p1, table="evolve_miss")
    ingest.append_csv(spark, p2, "evolve_miss")
    rows = {tuple(x) for x in spark.table("evolve_miss").collect()}
    assert rows == {(1, "x"), (5, None)}


def test_salted_count_distinct_equals_plain(spark, sf_dir):
    l = Q.load(spark, sf_dir, "lineitem")
    got = {
        (r["l_returnflag"], r["n_distinct_l_partkey"])
        for r in skew.salted_count_distinct(l, "l_returnflag", "l_partkey").collect()
    }
    want = {
        tuple(r)
        for r in l.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert got == want


def test_salted_join_equals_plain(spark, sf_dir):
    l = Q.load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = Q.load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    salted = skew.salted_join(l, o, "l_orderkey", "o_orderkey", salt=4)
    plain = l.join(o, l.l_orderkey == o.o_orderkey)
    assert salted.count() == plain.count()
    got = {
        tuple(r)
        for r in salted.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    want = {
        tuple(r)
        for r in plain.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_shingle_df_cap_kills_hot_shingle(spark):
    """A boilerplate shingle in 50% of docs must not produce O(df²)
    candidate pairs when max_df is set; pairs that DO survive keep
    exact Jaccard values (verification runs over full shingle sets)."""
    from datasette_upload_csvs_spark.operators import dedup

    rows = []
    # 30 docs share one boilerplate 3-gram, otherwise pairwise-unique
    for i in range(30):
        rows.append((i, f"u{i}a u{i}b lorem ipsum dolor u{i}c u{i}d"))
    # 3 planted near-dup pairs with no boilerplate, 10 shared tokens
    for j in range(3):
        base = " ".join(f"p{j}w{k}" for k in range(10))
        rows.append((100 + 2 * j, base + " extraone"))
        rows.append((101 + 2 * j, base + " extratwo"))
    docs = spark.createDataFrame(rows, "doc_id int, text string")

    # all-pairs baseline needs an EXPLICIT max_df=None since round 8
    uncapped = dedup.ngram_jaccard_pairs(
        docs, threshold=0.0, max_df=None
    ).collect()
    capped = dedup.ngram_jaccard_pairs(docs, threshold=0.0, max_df=10).collect()

    # without the cap the hot shingle makes 30*29/2 = 435 boilerplate pairs
    assert len(uncapped) >= 435
    # with the cap only content-similar pairs survive (linear, not df²)
    assert len(capped) < 20
    planted = {(r["id_a"], r["id_b"]) for r in capped if r["id_a"] >= 100}
    assert planted == {(100, 101), (102, 103), (104, 105)}
    # exactness: surviving pairs carry identical jaccard to the uncapped run
    exact = {(r["id_a"], r["id_b"]): r["jaccard"] for r in uncapped}
    for r in capped:
        assert abs(exact[(r["id_a"], r["id_b"])] - r["jaccard"]) < 1e-12

"""Content-defined sampling: reproducibility properties RNG-based
sample() cannot give."""

from __future__ import annotations

from pyspark.sql import functions as F

from datasette_upload_csvs_spark.operators import sampling
from datasette_upload_csvs_spark.sources.parquet import read_table


def test_sample_stable_under_repartition(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    a = {r["o_orderkey"] for r in
         sampling.deterministic_sample(orders, "o_orderkey", 0.2)
         .select("o_orderkey").collect()}
    b = {r["o_orderkey"] for r in
         sampling.deterministic_sample(orders.repartition(7), "o_orderkey", 0.2)
         .select("o_orderkey").collect()}
    assert a == b and a  # same verdicts regardless of layout


def test_sample_fraction_and_monotone_nesting(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    n = orders.count()
    small = sampling.deterministic_sample(orders, "o_orderkey", 0.1)
    big = sampling.deterministic_sample(orders, "o_orderkey", 0.3)
    ns, nb = small.count(), big.count()
    assert abs(ns / n - 0.1) < 0.03 and abs(nb / n - 0.3) < 0.04
    # nested property: the 10% sample is a subset of the 30% sample
    assert small.join(big, "o_orderkey", "left_anti").count() == 0


def test_stratified_rates(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").withColumn(
        "rk", F.concat_ws("-", "l_orderkey", "l_linenumber")
    )
    out = sampling.stratified_sample(
        li, "rk", "l_returnflag", {"A": 0.1, "R": 0.4}
    )
    base = {r["l_returnflag"]: r["n"] for r in
            li.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()}
    got = {r["l_returnflag"]: r["n"] for r in
           out.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()}
    assert "N" not in got  # unlisted stratum dropped (sampleBy contract)
    assert abs(got["A"] / base["A"] - 0.1) < 0.05
    assert abs(got["R"] / base["R"] - 0.4) < 0.06


def test_weighted_sample_favors_heavy_rows(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    k = 200
    got = sampling.weighted_sample(orders, "o_orderkey", "o_totalprice", k)
    assert got.count() == k
    # mean totalprice of an A-Res weighted sample must exceed the
    # population mean (inclusion probability grows with weight)
    pop = orders.agg(F.avg("o_totalprice")).collect()[0][0]
    smp = got.agg(F.avg("o_totalprice")).collect()[0][0]
    assert smp > pop * 1.1
    # deterministic: same draw every time
    again = sampling.weighted_sample(orders, "o_orderkey", "o_totalprice", k)
    assert {r[0] for r in got.collect()} == {r[0] for r in again.collect()}


def test_n_per_group_exact_counts(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    out = sampling.sample_n_per_group(orders, "o_orderkey", "o_orderstatus", 7)
    counts = {r["o_orderstatus"]: r["n"] for r in
              out.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()}
    assert all(v == 7 for v in counts.values()) and len(counts) == 3


def test_weighted_sample_guards_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 0.0), (3, -4.0), (4, 5.0)], "k long, w double"
    )
    got = {r["k"] for r in
           sampling.weighted_sample(df, "k", "w", 10).collect()}
    assert got == {1, 4}  # zero/negative weights never sampled

"""Per-key EWMA (applyInPandas) must equal the expression-fold EWMA
on every key's series."""

from __future__ import annotations

from pyspark.sql import functions as F

from datasette_upload_csvs_spark.operators.timeseries import ewma_by_key
from datasette_upload_csvs_spark.queries import load


def test_ewma_by_key_matches_fold(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    daily = (
        ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("double")
            .alias("v")
        )
        .filter(F.col("user_id") < 50)
    )
    got = ewma_by_key(daily, "user_id", "day", "v", alpha=0.2)

    # expression-fold reference: collect each user's series, prefix-fold
    ref = (
        daily.groupBy("user_id")
        .agg(F.array_sort(F.collect_list(F.struct("day", "v"))).alias("sx"))
        .select(
            "user_id",
            F.expr("transform(sx, e -> e.day)").alias("ds"),
            F.expr("transform(sx, e -> e.v)").alias("xs"),
        )
        .select(
            "user_id",
            F.explode(F.expr("sequence(1, size(xs))")).alias("i"),
            "ds",
            "xs",
        )
        .select(
            "user_id",
            F.expr("element_at(ds, i)").alias("day"),
            F.expr(
                "aggregate(slice(xs, 2, i - 1), element_at(xs, 1),"
                " (acc, x) -> 0.2 * x + 0.8 * acc)"
            ).alias("ewma_ref"),
        )
    )
    joined = got.join(ref, ["user_id", "day"])
    assert joined.count() == daily.count()
    bad = joined.filter(
        F.abs(F.col("ewma") - F.col("ewma_ref")) > 1e-9
    ).count()
    assert bad == 0


def test_ewma_by_key_string_key_and_date_ts(spark):
    """Schema is derived from the input: string keys and date
    timestamps must work (the schema was previously hardcoded
    long/timestamp)."""
    import datetime as dt

    df = spark.createDataFrame(
        [
            ("a", dt.date(2024, 1, 1), 1),
            ("a", dt.date(2024, 1, 2), 3),
            ("b", dt.date(2024, 1, 1), 10),
        ],
        "k string, d date, v int",
    )
    out = ewma_by_key(df, "k", "d", "v", alpha=0.5).collect()
    got = {(r["k"], str(r["d"])): r["ewma"] for r in out}
    assert got[("a", "2024-01-01")] == 1.0
    assert got[("a", "2024-01-02")] == 2.0  # 0.5*3 + 0.5*1
    assert got[("b", "2024-01-01")] == 10.0

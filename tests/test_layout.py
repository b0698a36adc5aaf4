"""Range clustering: disjoint per-file key ranges (the invariant that
makes row-group skipping effective) and semantic no-op."""

from pyspark.sql import functions as F

from datasette_upload_csvs_spark.sources.layout import (
    cluster_by,
    file_ranges,
    read_clustered,
)
from datasette_upload_csvs_spark.sources.parquet import read_table


def test_clustered_file_ranges_are_disjoint(spark, sf_dir, tmp_path):
    path = str(tmp_path / "li_clustered")
    li = read_table(spark, sf_dir, "lineitem")
    cluster_by(li, path, ["l_shipdate"], num_files=4)

    ranges = [r for r in file_ranges(path, "l_shipdate") if r != (None, None)]
    assert len(ranges) >= 2
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo, "range partitions must not interleave"

    # no rows harmed
    assert read_clustered(spark, path).count() == li.count()


def test_unclustered_layout_has_overlapping_ranges(spark, sf_dir, tmp_path):
    """Control: hash-shuffled layout spans the whole domain per file —
    the case clustering exists to fix."""
    path = str(tmp_path / "li_hashed")
    li = read_table(spark, sf_dir, "lineitem")
    li.repartition(4, "l_orderkey").write.mode("overwrite").parquet(path)
    ranges = file_ranges(path, "l_shipdate")
    assert len(ranges) >= 2
    ranges.sort()
    overlaps = sum(1 for (_, hi), (lo, _) in zip(ranges, ranges[1:]) if hi > lo)
    assert overlaps > 0


def test_filter_still_correct_on_clustered_data(spark, sf_dir, tmp_path):
    path = str(tmp_path / "li_filter")
    li = read_table(spark, sf_dir, "lineitem")
    cluster_by(li, path, ["l_shipdate"], num_files=4)
    pred = F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp")
    assert (
        read_clustered(spark, path).filter(pred).count() == li.filter(pred).count()
    )


def test_zorder_narrows_ranges_on_both_columns(spark, sf_dir, tmp_path):
    """Z-order clustering on (o_custkey, o_totalprice): per-file
    footer ranges must be materially narrower than the global domain
    in BOTH dimensions (lexicographic clustering only narrows the
    leading one)."""
    from datasette_upload_csvs_spark.sources.layout import (
        file_ranges,
        zorder_cluster,
    )

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    dst = str(tmp_path / "orders_z")
    zorder_cluster(orders, dst, ["o_custkey", "o_totalprice"], num_files=16)

    back = spark.read.parquet(dst)
    assert back.count() == orders.count()

    stats = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_totalprice"), F.max("o_totalprice"),
    ).collect()[0]
    for col, lo, hi in [
        ("o_custkey", stats[0], stats[1]),
        ("o_totalprice", stats[2], stats[3]),
    ]:
        spans = [
            (mx - mn) / (hi - lo) for mn, mx in file_ranges(dst, col)
        ]
        avg_span = sum(spans) / len(spans)
        # random layout would put ~1.0 here; z-order must cut it
        assert avg_span < 0.55, (col, avg_span)


def test_compact_small_files(spark, sf_dir, tmp_path):
    from datasette_upload_csvs_spark.sources.layout import compact_files

    orders = read_table(spark, sf_dir, "orders")
    dst = str(tmp_path / "frag")
    orders.repartition(64).write.parquet(dst)  # fragment: 64 tiny files
    n = orders.count()
    before, after = compact_files(spark, dst, target_mb=128)
    assert before == 64 and after < 8
    assert spark.read.parquet(dst).count() == n
    # clustered compaction: sorted + disjoint output
    before2, after2 = compact_files(
        spark, dst, target_mb=1, sort_cols=["o_orderkey"]
    )
    assert spark.read.parquet(dst).count() == n

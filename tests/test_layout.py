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

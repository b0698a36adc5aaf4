"""Property-based checks for the round-4 two-phase algorithms: the
distributed prefix sum (pack_concat_chunks) and the band-prefix
global rank (balanced_shards) must equal their naive single-node
specs on arbitrary inputs — any bucket/band boundary bug shows up as
an off-by-one here long before it corrupts a 100 TB run."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from datasette_upload_csvs_spark.operators.curation import pack_concat_chunks
from datasette_upload_csvs_spark.operators.export import balanced_shards

# doc_id gaps included: bucketing by id-range must not assume dense ids
_DOCS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),  # doc_id (deduped below)
        st.integers(min_value=0, max_value=50),      # token count
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_DOCS)
def test_pack_prefix_equals_naive(spark, docs):
    rows = [(i, "w " * max(n, 0)) for i, n in docs]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in pack_concat_chunks(
            df, chunk_tokens=7, bucket_size=13
        ).collect()
    }
    expect = 0
    for i, n in sorted(docs):
        eff = max(n, 1)  # empty docs still occupy one slot (greatest)
        r = got[i]
        assert r.start_offset == expect, (i, r.start_offset, expect)
        assert r.first_chunk == expect // 7
        assert r.last_chunk == (expect + eff - 1) // 7
        expect += eff


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_DOCS)
def test_balanced_shards_rank_equals_naive(spark, docs):
    df = spark.createDataFrame(list(docs), "doc_id long, n int")
    got = {
        r.doc_id: r.shard_id
        for r in balanced_shards(df, "n", num_shards=5).collect()
    }
    naive = sorted(docs, key=lambda t: (-t[1], t[0]))
    for rank, (i, _) in enumerate(naive, start=1):
        assert got[i] == (rank - 1) % 5, (i, got[i], rank)

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
    # canonical order = (size desc, md5 salt, id): the salt de-skews
    # hot size bands; replicate md5_low64 % 32 here
    naive = sorted(docs, key=lambda t: (-t[1], _salt32(t[0]), t[0]))
    for rank, (i, _) in enumerate(naive, start=1):
        assert got[i] == (rank - 1) % 5, (i, got[i], rank)


def _salt32(doc_id: int) -> int:
    """Python twin of export.md5_low64(id) % 32 (little-endian uint64
    of md5 bytes 9..16 — DuckDB's md5_number_lower)."""
    import hashlib

    d = hashlib.md5(str(doc_id).encode()).digest()
    return int.from_bytes(d[8:16], "little") % 32


def test_balanced_shards_hot_band_fans_out(spark):
    """Adversarial corpus: EVERY doc has the same size (the
    truncated-to-context-length shape). The rank stage must hash on
    (size, salt) so the single hot band spreads over salt buckets
    instead of one task, and the assignment must still equal the
    naive (size desc, salt, id) deal."""
    from datasette_upload_csvs_spark import plans

    docs = [(i, 2048) for i in range(400)]
    df = balanced_shards(
        spark.createDataFrame(docs, "doc_id long, n int"), "n", num_shards=4
    )
    txt = plans.executed_plan(df)
    assert "_salt" in txt.split("Exchange hashpartitioning")[1][:80], (
        "rank stage must partition by (_n, _salt), got:\n" + txt
    )
    got = {r.doc_id: r.shard_id for r in df.collect()}
    naive = sorted(docs, key=lambda t: (-t[1], _salt32(t[0]), t[0]))
    for rank, (i, _) in enumerate(naive, start=1):
        assert got[i] == (rank - 1) % 4
    # salt really fans the band out: many distinct salt values exist
    assert len({_salt32(i) for i, _ in docs}) > 16

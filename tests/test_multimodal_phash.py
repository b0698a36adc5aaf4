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


def test_n_chunks_extends_exact_recall(spark, sf_dir):
    # c chunks of 64/c bits pigeonhole >=1 identical chunk whenever
    # hamming < c: at n_chunks=8 the bucketed join must equal the
    # all-pairs relation for hamming <= 7 (4 chunks would be lossy
    # past 3) — verified against a brute-force cross join
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    media = multimodal.fake_documents_media(docs)
    fp = multimodal.perceptual_hashes(media).select(
        "media_id", "dhash64"
    ).persist()
    bucketed = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.fingerprint_hamming_pairs(
            fp, "dhash64", "media_id", max_hamming=7, n_chunks=8
        ).collect()
    }
    a = fp.selectExpr("media_id AS id_a", "dhash64 AS fa")
    b = fp.selectExpr("media_id AS id_b", "dhash64 AS fb")
    brute = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= 7)
        .collect()
    }
    assert bucketed == brute
    # ...and 4 chunks at the same distance is recall-LOSSY by design
    four = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.fingerprint_hamming_pairs(
            fp, "dhash64", "media_id", max_hamming=7, n_chunks=4,
            allow_lossy=True
        ).collect()
    }
    assert four <= bucketed
    spark.catalog.clearCache()


def test_n_chunks_validated(spark):
    import pytest

    fp = spark.createDataFrame([(1, 5)], "media_id long, dhash64 long")
    with pytest.raises(ValueError):
        dedup.fingerprint_hamming_pairs(fp, "dhash64", "media_id", n_chunks=5)


def test_decoder_seam(spark, sf_dir):
    """Round-9 VERDICT item 5: perceptual_hashes/extract_features
    accept a pluggable decoder. The stub (default) and an injected
    fake decoder must produce DIFFERENT but each-deterministic
    hashes; the bit math downstream of the decode is shared."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    media = multimodal.fake_documents_media(docs)

    def fake_decoder(payload, mime=None):
        # stands in for decode->grayscale: bytes tiled into a 16x16
        # matrix (deliberately NOT the stub's stride sampling)
        import numpy as np

        b = np.frombuffer(payload or b"\x00", dtype=np.uint8)
        reps = -(-256 // len(b))
        return np.tile(b, reps)[:256].reshape(16, 16)

    stub = {
        r["media_id"]: (r["dhash64"], r["ahash64"])
        for r in multimodal.perceptual_hashes(media).collect()
    }
    inj1 = {
        r["media_id"]: (r["dhash64"], r["ahash64"])
        for r in multimodal.perceptual_hashes(
            media, decoder=fake_decoder
        ).collect()
    }
    inj2 = {
        r["media_id"]: (r["dhash64"], r["ahash64"])
        for r in multimodal.perceptual_hashes(
            media, decoder=fake_decoder
        ).collect()
    }
    assert inj1 == inj2  # deterministic
    assert inj1 != stub  # pixels come from the decoder, not the stub
    assert set(inj1) == set(stub)

    f_stub = {
        r["media_id"]: r["feat_mean"]
        for r in multimodal.extract_features(media).collect()
    }
    f_inj = {
        r["media_id"]: r["feat_mean"]
        for r in multimodal.extract_features(
            media, decoder=fake_decoder
        ).collect()
    }
    assert set(f_stub) == set(f_inj) and f_stub != f_inj


def test_pil_decoder_gated(spark):
    """pil_decoder() either returns a usable decoder (PIL present) or
    raises the typed DecoderUnavailable — never a bare ImportError."""
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if has_pil:
        assert callable(multimodal.pil_decoder())
    else:
        import pytest as _pytest

        with _pytest.raises(multimodal.DecoderUnavailable):
            multimodal.pil_decoder()


def test_downsample_math():
    """Area-mean pooling + nearest-neighbor fallback — the shared
    post-decode math every injected decoder rides."""
    import numpy as np

    g = np.arange(64, dtype=np.float64).reshape(8, 8)
    out = multimodal._downsample(g, 8, 8)
    assert np.array_equal(out, g)  # identity at target size
    big = np.ones((64, 72)) * 7.0
    assert np.allclose(multimodal._downsample(big, 8, 9), 7.0)
    tiny = np.array([[1.0, 2.0], [3.0, 4.0]])
    nn = multimodal._downsample(tiny, 8, 9)
    assert nn.shape == (8, 9)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        multimodal._downsample(np.empty((0, 0)), 8, 9)

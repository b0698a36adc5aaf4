"""Multimodal column plumbing: binary payloads + typed metadata.

Design: image/audio/video payloads are opaque ``binary`` columns
carried next to typed metadata (mime, width/height, duration, ...).
The Spark-side machinery — schemas, partition sizing, Arrow-batched
``mapInPandas`` decode/feature-extract stages — is real and tested;
the codec calls themselves are stubbed (the container has no
image/audio libraries) behind ``DecoderUnavailable`` with a
deterministic fake used by tests.

Scale notes: payload columns dominate bytes, so (1) never shuffle a
binary column you don't need — project metadata early, join payloads
back by key late; (2) size input partitions by bytes not rows
(spark.sql.files.maxPartitionBytes governs the parquet side);
(3) decode stages run ``mapInPandas`` with small Arrow batches so
executor memory holds only a batch of decoded frames, not a
partition of them.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("feat_mean", StringType(), True),  # hex digest of fake feature
    ]
)


class DecoderUnavailable(NotImplementedError):
    """Raised when a real codec (PIL/ffmpeg/...) would be required."""


def _decode_image(payload: bytes, mime: str):  # pragma: no cover - stub
    raise DecoderUnavailable(
        f"no image codec in this environment (mime={mime}); "
        "install PIL/opencv to enable real decode"
    )


def fake_documents_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from `documents`.

    Payload = utf-8 bytes of the text (stands in for an encoded
    image); lets the full mapInPandas pipeline run end-to-end in an
    environment with no codecs.
    """
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("application/fake").alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
        F.pmod(F.col("doc_id"), F.lit(1920)).cast("int").alias("width"),
        F.pmod(F.col("doc_id"), F.lit(1080)).cast("int").alias("height"),
    )


def extract_features(media: DataFrame, use_fake_decoder: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas streams small pandas batches through the (stubbed)
    decoder; schema/partitioning/batching are production-shaped, the
    per-payload 'feature' is a deterministic digest when faked.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if pdf.empty:
                continue
            if not use_fake_decoder:
                _decode_image(pdf["payload"].iloc[0], pdf["mime"].iloc[0])
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "feat_mean": pdf["payload"].map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan* — metadata-only at this layer.

    Emits one row per sampled frame index based on duration metadata;
    actual frame decode is the stubbed decoder. Demonstrates the
    explode-by-sequence shape (rows multiply JVM-side; payload joined
    back by media_id only for the frames actually decoded).
    """
    return media.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("width"), F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )


def resize_media(
    media: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    use_fake_decoder: bool = True,
) -> DataFrame:
    """Arrow-batched resize over binary payloads (the preprocessing
    step in front of any vision encoder). The Spark plumbing —
    mapInPandas batch shape, MEDIA_SCHEMA in/out, metadata update —
    is real; the pixel work is the stubbed codec. The fake path is
    deterministic: payload re-hashed to a fixed-size pseudo-bitmap
    (target_w*target_h//8 bytes from an md5 HEX-string chain — hex,
    not raw digests, so an SQL oracle with a VARCHAR-only md5 can
    reproduce any prefix of the chain), letting tests assert exact
    output sizes and stable bytes without PIL.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        n_out = max(1, target_w * target_h // 8)
        for pdf in batches:
            if pdf.empty:
                continue
            payloads = []
            for p in pdf["payload"]:
                if not use_fake_decoder:
                    _decode_image(bytes(p or b""), "application/fake")
                buf = bytearray()
                seed = hashlib.md5(bytes(p or b"")).hexdigest()
                while len(buf) < n_out:
                    seed = hashlib.md5(seed.encode("ascii")).hexdigest()
                    buf.extend(bytes.fromhex(seed))
                payloads.append(bytes(buf[:n_out]))
            out = pdf.copy()
            out["payload"] = payloads
            out["width"] = target_w
            out["height"] = target_h
            yield out

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)

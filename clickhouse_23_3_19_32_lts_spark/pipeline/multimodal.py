"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio codecs, so the decode kernels are STUBS —
`decode_image` raises NotImplementedError unless `fake=True`, which produces
a deterministic synthetic decode. Everything Spark-side is real and tested:
schema, Arrow batch shape, mapInPandas plumbing, partition sizing.

Design for 100 TB of media:
  - blobs stay an opaque `binary` column; metadata (width/height/codec/
    duration) is a sibling struct so filters prune WITHOUT touching bytes
    (Parquet column pruning skips the blob pages entirely);
  - decode/feature kernels run via mapInPandas: Arrow moves the bytes to
    Python zero-copy per batch; `spark.sql.files.maxPartitionBytes` and
    `maxRecordsPerBatch` bound peak memory (a 256 MB partition of blobs →
    bounded pandas batches);
  - frame sampling emits multiple rows per video via the iterator form —
    no collect, no driver involvement.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("blob", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("n_frames", IntegerType()),
                    StructField("codec", StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("decoded_bytes", LongType()),
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_hash", StringType()),
    ]
)


def _fake_decode(blob: bytes) -> bytes:
    """Deterministic stand-in for a codec: identity + md5-mixed padding."""
    digest = hashlib.md5(blob).digest()
    return blob + digest


def decode_image(blob: bytes, fake: bool = False) -> bytes:
    """Decode an image blob to raw pixels. STUB: no codec libs in this
    container — real impl would use PIL/opencv here."""
    if fake:
        return _fake_decode(blob)
    raise NotImplementedError("image codecs not available in this environment")


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """blob → FEATURE_DIM float feature vector, via mapInPandas.

    The feature kernel is the deterministic fake (md5-derived); swapping in
    a real model changes only the inner function, not the Spark plumbing.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, sizes = [], []
            for blob in pdf["blob"]:
                raw = decode_image(bytes(blob), fake=fake)
                d = hashlib.md5(raw).digest()
                feats.append([d[i] / 255.0 for i in range(FEATURE_DIM)])
                sizes.append(len(raw))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats, "decoded_bytes": sizes}
            )

    return df.select("media_id", "blob").mapInPandas(kernel, FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 2, fake: bool = True) -> DataFrame:
    """video rows → one row per sampled frame (iterator mapInPandas —
    output rows ≫ input rows without any driver involvement)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_hash = [], [], []
            for media_id, blob, n_frames in zip(
                pdf["media_id"], pdf["blob"], pdf["n_frames"]
            ):
                raw = decode_image(bytes(blob), fake=fake)
                for idx in range(0, int(n_frames), every_n):
                    out_id.append(media_id)
                    out_idx.append(idx)
                    out_hash.append(
                        hashlib.md5(raw + idx.to_bytes(4, "big")).hexdigest()[:16]
                    )
            yield pd.DataFrame(
                {"media_id": out_id, "frame_idx": out_idx, "frame_hash": out_hash}
            )

    flat = df.select("media_id", "blob", F.col("meta.n_frames").alias("n_frames"))
    return flat.mapInPandas(kernel, FRAMES_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Metadata-only resize: rewrites meta, passes blob through. Real resize
    would decode+scale in the same mapInPandas shape as extract_features."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.n_frames").alias("n_frames"),
            F.col("meta.codec").alias("codec"),
        ),
    )

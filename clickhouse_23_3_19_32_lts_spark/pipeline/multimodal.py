"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Decode support is tiered: the self-describing containers that need no codec
library — BMP (24/32-bit BI_RGB), PPM (P6/P3), WAV (PCM) — decode for real
via pipeline/codecs.py (pure Python, roundtrip-tested). Formats that need
external codecs (JPEG/PNG/MP4 — no PIL/opencv/ffmpeg in this container)
still raise NotImplementedError unless `fake=True`, which produces a
deterministic synthetic decode. Everything Spark-side is real and tested:
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
    """Decode an image blob to raw RGB pixel bytes (row-major top-down).

    BMP and PPM decode for real (pipeline/codecs.py); other containers
    need external codec libs this environment lacks — `fake=True` swaps in
    the deterministic stand-in, otherwise NotImplementedError."""
    from clickhouse_23_3_19_32_lts_spark.pipeline import codecs

    kind = codecs.sniff(blob)
    if kind == "bmp":
        return codecs.decode_bmp(blob)[3]
    if kind == "ppm":
        return codecs.decode_ppm(blob)[3]
    if fake:
        return _fake_decode(blob)
    raise NotImplementedError(
        "only BMP/PPM decode without codec libs; JPEG/PNG need PIL/opencv"
    )


def decode_audio(blob: bytes, fake: bool = False) -> bytes:
    """Decode an audio blob to raw PCM frame bytes. WAV (PCM 8/16-bit)
    decodes for real; compressed codecs are environment-stubbed."""
    from clickhouse_23_3_19_32_lts_spark.pipeline import codecs

    if codecs.sniff(blob) == "wav":
        return codecs.decode_wav(blob)[3]
    if fake:
        return _fake_decode(blob)
    raise NotImplementedError(
        "only WAV PCM decodes without codec libs; mp3/aac need ffmpeg"
    )


def image_meta(blob: bytes) -> tuple[int, int] | None:
    """(width, height) for decodable containers, None otherwise."""
    from clickhouse_23_3_19_32_lts_spark.pipeline import codecs

    kind = codecs.sniff(blob)
    if kind == "bmp":
        w, h, _, _ = codecs.decode_bmp(blob)
        return (w, h)
    if kind == "ppm":
        w, h, _, _ = codecs.decode_ppm(blob)
        return (w, h)
    return None


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


def resize_pixels(
    rgb: bytes, sw: int, sh: int, dw: int, dh: int
) -> bytes:
    """Nearest-neighbor RGB resize (pure Python — the real kernel for the
    decodable containers; a model-serving deployment would swap in a
    vectorized library without touching the Spark plumbing)."""
    out = bytearray(dw * dh * 3)
    for y in range(dh):
        sy = min(sh - 1, y * sh // dh)
        src_row = sy * sw * 3
        dst_row = y * dw * 3
        for x in range(dw):
            sx = min(sw - 1, x * sw // dw)
            s = src_row + sx * 3
            d = dst_row + x * 3
            out[d : d + 3] = rgb[s : s + 3]
    return bytes(out)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Real decode → nearest-neighbor scale → PPM re-encode for BMP/PPM
    blobs via mapInPandas; non-decodable blobs pass through unchanged with
    their original meta (documented environment limit)."""
    from clickhouse_23_3_19_32_lts_spark.pipeline import codecs

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, metas = [], []
            for blob, meta in zip(pdf["blob"], pdf["meta"]):
                blob = bytes(blob)
                kind = codecs.sniff(blob)
                if kind in ("bmp", "ppm"):
                    dec = (
                        codecs.decode_bmp(blob)
                        if kind == "bmp"
                        else codecs.decode_ppm(blob)
                    )
                    sw, sh, _, rgb = dec
                    scaled = resize_pixels(rgb, sw, sh, width, height)
                    blobs.append(codecs.encode_ppm(width, height, scaled))
                    metas.append(
                        {
                            "width": width,
                            "height": height,
                            "n_frames": meta["n_frames"],
                            "codec": "ppm",
                        }
                    )
                else:
                    blobs.append(blob)
                    metas.append(meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "blob": blobs,
                    "meta": metas,
                }
            )

    return df.select("media_id", "kind", "blob", "meta").mapInPandas(
        kernel, MEDIA_SCHEMA
    )

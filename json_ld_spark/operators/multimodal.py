"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video cells are ``binary`` columns with a typed metadata struct;
decode / feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` kernels. The codec libraries are not in this container, so
the decode step is STUBBED: ``decode_image`` raises NotImplementedError
unless ``fake=True`` selects a deterministic fake decoder — but the
Spark-side plumbing (schema, batch shape, partitioning, UDF signature) is
real and tested, which is the contract at 100 TB (swap the kernel body,
keep the plan).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("payload", BinaryType()),      # opaque encoded bytes
    StructField("mime", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("feature", ArrayType(FloatType())),
    StructField("n_bytes", IntegerType()),
])


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table: payload = repeatable digest bytes."""
    base = spark.range(n).select(F.col("id").alias("media_id"))
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("media_id"), F.lit(3)) + 1).cast("int"),
    )
    payload = F.sha2(F.col("media_id").cast("string"), 256).cast("binary")
    return base.select(
        "media_id",
        kind.alias("kind"),
        payload.alias("payload"),
        F.when(kind == "image", "image/png")
        .when(kind == "audio", "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        F.when(kind == "image", (F.pmod(F.col("media_id"), F.lit(4)) * 128 + 128).cast("int")).alias("width"),
        F.when(kind == "image", F.lit(256)).alias("height"),
        F.when(kind != "image", (F.pmod(F.col("media_id"), F.lit(10)) * 1000 + 500).cast("int")).alias("duration_ms"),
    )


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB: real decode needs PIL/opencv (absent in this container)."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/opencv; pass fake=True for the "
            "deterministic test decoder"
        )
    digest = hashlib.sha256(payload).digest()
    arr = np.frombuffer(digest * 8, dtype=np.uint8)[: 16 * 16].reshape(16, 16)
    return arr


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction: 8-dim deterministic descriptor per
    payload. Batch shape: one Arrow batch in → one feature row per media
    row out (1:1, no fan-out)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes = [], []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                img = decode_image(raw, fake=fake)
                hist = np.histogram(img, bins=8, range=(0, 255))[0]
                feats.append((hist / max(hist.sum(), 1)).astype(np.float32).tolist())
                nbytes.append(len(raw))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": feats,
                "n_bytes": nbytes,
            })

    return media.select("media_id", "kind", "payload").mapInPandas(
        kernel, schema=FEATURE_SCHEMA
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: explodes (media_id, frame_ts_ms)
    JVM-side; the decode of each frame is the same stubbed kernel."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("duration_ms"), F.lit(every_ms)
                )
            ).alias("frame_ts_ms"),
        )
    )

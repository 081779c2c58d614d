"""Multimodal plumbing tests (prompt contract: decode stubbed, Spark-side
schema/batch-shape/partitioning real and tested)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from json_ld_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    decode_image,
    extract_features,
    sample_frames,
    synth_media,
)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00\x01")


def test_decode_fake_deterministic():
    a = decode_image(b"payload", fake=True)
    b = decode_image(b"payload", fake=True)
    assert a.shape == (16, 16) and a.dtype == np.uint8
    assert (a == b).all()


def test_extract_features_schema_and_determinism(spark):
    media = synth_media(spark, 96)
    feats = extract_features(media, fake=True)
    assert feats.schema == FEATURE_SCHEMA
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 96
    for r in rows.values():
        assert len(r["feature"]) == 8
        assert abs(sum(r["feature"]) - 1.0) < 1e-5  # normalized histogram
        assert r["n_bytes"] == 64  # sha256 hex digest as utf-8 bytes
    again = {r["media_id"]: r for r in extract_features(media, fake=True).collect()}
    assert {k: v["feature"] for k, v in rows.items()} == {
        k: v["feature"] for k, v in again.items()
    }


def test_extract_features_real_decode_path_raises(spark):
    media = synth_media(spark, 4)
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        extract_features(media, fake=False).collect()


def test_sample_frames_counts(spark):
    media = synth_media(spark, 60)
    frames = sample_frames(media, every_ms=1000)
    got = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    videos = {r["media_id"]: r["duration_ms"] for r in media.where(
        F.col("kind") == "video").collect()}
    assert set(got) == set(videos)
    for mid, dur in videos.items():
        assert got[mid] == dur // 1000 + 1

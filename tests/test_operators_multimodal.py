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


def test_ppm_decode_roundtrip():
    import numpy as np

    from json_ld_spark.operators.multimodal import _ppm_payload, decode_image

    payload, w, h = _ppm_payload(6)
    img = decode_image(payload)  # REAL path, no fake flag
    assert img.shape == (h, w, 3)
    assert img.dtype == np.uint8
    # comment-tolerant header
    commented = payload.replace(b"P6\n", b"P6\n# a comment\n", 1)
    assert (decode_image(commented) == img).all()


def test_wav_decode_roundtrip_and_chunk_walk():
    import struct

    import numpy as np

    from json_ld_spark.operators.multimodal import _wav_payload, decode_audio_wav

    payload, _dur = _wav_payload(9)
    samples, rate = decode_audio_wav(payload)
    assert rate == 8000 and samples.dtype == np.dtype("<i2")
    # extra chunk between fmt and data must be tolerated (chunk walking)
    head, rest = payload[:12], payload[12:]
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    assert (decode_audio_wav(head + extra + rest)[0] == samples).all()


def test_codec_bound_decode_still_declared_stub():
    """PNG is now real; JPEG/video remain the declared stub."""
    import pytest

    from json_ld_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError, match="codecs"):
        decode_image(b"\xff\xd8\xff\xe0jpeg-ish")


def test_media_decode_stats_matches_local(spark):
    """End-to-end Spark decode == driver-side decode of the same payloads."""
    import hashlib

    import numpy as np

    from json_ld_spark.operators.multimodal import (
        _ppm_payload,
        decode_image,
        media_decode_stats,
        synth_real_media,
    )

    out = {
        r["media_id"]: r
        for r in media_decode_stats(synth_real_media(spark, 20)).collect()
    }
    assert len(out) == 20
    payload, w, h = _ppm_payload(0)
    img = decode_image(payload)
    r = out[0]
    assert (r["width"], r["height"]) == (w, h)
    assert r["value_sum"] == int(img.astype(np.int64).sum())
    assert r["decoded_md5"] == hashlib.md5(img.tobytes()).hexdigest()
    # PNG row (mid % 3 == 2) decodes for real in the Spark kernel too
    from json_ld_spark.operators.multimodal import _png_payload

    png_payload, pw, ph = _png_payload(2)
    png_img = decode_image(png_payload)
    r2 = out[2]
    assert (r2["width"], r2["height"]) == (pw, ph)
    assert r2["value_sum"] == int(png_img.astype(np.int64).sum())
    assert r2["decoded_md5"] == hashlib.md5(png_img.tobytes()).hexdigest()
    assert all(row["error_code"] is None for row in out.values())


def test_png_decode_roundtrip_all_filters():
    """The fixture encoder cycles filter types 0-4 per scanline; decode
    must reconstruct the exact pixel pattern for RGB and RGBA."""
    import numpy as np

    from json_ld_spark.operators.multimodal import _decode_png, _png_payload

    for mid in (2, 5):  # even → RGB, odd → RGBA
        payload, w, h = _png_payload(mid)
        arr = _decode_png(payload)
        ch = 4 if mid % 2 else 3
        yy, xx, cc = np.meshgrid(
            np.arange(h), np.arange(w), np.arange(ch), indexing="ij"
        )
        want = ((xx * 5 + yy * 3 + mid * 7 + cc * 11) % 256).astype(np.uint8)
        assert arr.shape == (h, w, ch)
        assert np.array_equal(arr, want)


def test_png_decode_grayscale():
    import struct
    import zlib

    import numpy as np

    from json_ld_spark.operators.multimodal import (
        _PNG_SIG, _decode_png, _png_chunk,
    )

    g = (np.arange(64, dtype=np.uint8) * 3 % 251).reshape(8, 8)
    lines = b"".join(bytes([0]) + g[y].tobytes() for y in range(8))
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(lines))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(_decode_png(payload), g)


def test_media_decode_stats_quarantines_corrupt_payloads(spark):
    """One truncated payload must yield ONE error row, not a failed job
    (per-row quarantine, same philosophy as extraction error rows)."""
    from pyspark.sql import Row

    from json_ld_spark.operators.multimodal import (
        _png_payload, _wav_payload, media_decode_stats,
    )

    good_png, _, _ = _png_payload(2)
    good_wav, _ = _wav_payload(1)
    rows = [
        Row(media_id=0, kind="image", payload=bytes(good_png)),
        Row(media_id=1, kind="image", payload=bytes(good_png[:30])),  # truncated
        Row(media_id=2, kind="audio", payload=bytes(good_wav)),
        Row(media_id=3, kind="audio", payload=b"RIFFxxxxWAVE"),  # no chunks
        Row(media_id=4, kind="image", payload=b"\xff\xd8jpeg"),  # stubbed codec
    ]
    out = {
        r["media_id"]: r
        for r in media_decode_stats(spark.createDataFrame(rows)).collect()
    }
    assert out[0]["error_code"] is None and out[0]["n_values"] is not None
    assert out[2]["error_code"] is None and out[2]["n_values"] is not None
    assert out[1]["error_code"] == "ValueError"
    assert out[3]["error_code"] == "ValueError"
    assert out[4]["error_code"] == "NotImplementedError"
    assert all(
        out[i]["n_values"] is None and out[i]["decoded_md5"] is None
        for i in (1, 3, 4)
    )

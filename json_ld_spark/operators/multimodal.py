"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video cells are ``binary`` columns with a typed metadata struct;
decode / feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` kernels.

Decode status (round 4 — honest split):
- **REAL decoders**, no codec library needed: binary PPM (``P6``) images,
  RIFF/WAVE PCM-16 audio, and — new this round — **PNG** (8-bit
  greyscale/RGB/RGBA, non-interlaced: chunk walk, stdlib ``zlib``
  inflate, all five scanline filters reconstructed in numpy with the
  recurrence lane-vectorized across channels). ``synth_real_media``
  generates genuine PPM/WAV/PNG payloads (PNG rows cycle every filter
  type) so the real decode paths run end-to-end in-sandbox
  (``mm_decode_stats`` query, independent parser golden).
- **Declared stub** for codec-bound formats (JPEG/MP4): those need
  libjpeg/ffmpeg-class libraries absent in this container, so
  ``decode_image`` raises NotImplementedError unless ``fake=True``
  selects the deterministic fake decoder. The Spark-side plumbing
  (schema, batch shape, partitioning, UDF signature) is identical either
  way — the contract at 100 TB is "swap the kernel body, keep the plan".
- **Per-row quarantine**: ``media_decode_stats`` catches decode errors
  per row and emits an ``error_code`` column instead of failing the job
  (same philosophy as the extraction pipeline's error rows).
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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
    """Decode an image payload to a (H, W[, 3]) uint8 array.

    Binary PPM (``P6``) and PNG (8-bit grey/RGB/RGBA, non-interlaced)
    decode FOR REAL — numpy + stdlib zlib, no codec library. JPEG needs
    libjpeg-class codecs, absent in this container: NotImplementedError
    unless ``fake=True`` selects the deterministic fake decoder (16×16
    digest image)."""
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    if not fake:
        raise NotImplementedError(
            "JPEG/video decode requires libjpeg/ffmpeg-class codecs; "
            "supply PPM or PNG payloads, or pass fake=True for the "
            "deterministic test decoder"
        )
    digest = hashlib.sha256(payload).digest()
    arr = np.frombuffer(digest * 8, dtype=np.uint8)[: 16 * 16].reshape(16, 16)
    return arr


def _decode_ppm(payload: bytes) -> np.ndarray:
    """P6 parser: returns (h, w, 3) uint8."""
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported (maxval={maxval})")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # grey, RGB, grey+A, RGBA


def _decode_png(payload: bytes) -> np.ndarray:
    """REAL PNG decode for 8-bit non-interlaced images (color types
    0/2/4/6): chunk walk → IDAT concat → zlib inflate → per-scanline
    filter reconstruction (PNG spec §9, filters 0-4). Serial filters
    (Sub/Average/Paeth) recurse pixel-to-pixel, so the loop runs over
    pixels with the byte lanes of each pixel vectorized — O(w) numpy steps
    per line, not O(w·channels) Python steps."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr: bytes | None = None
    idat: list[bytes] = []
    while pos + 8 <= len(payload):
        length = int.from_bytes(payload[pos:pos + 4], "big")
        ctype = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    w, h, depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    channels = _PNG_CHANNELS.get(color_type)
    if depth != 8 or channels is None:
        raise NotImplementedError(
            f"only 8-bit grey/RGB(A) PNG supported "
            f"(depth={depth}, color_type={color_type})"
        )
    if comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError("interlaced/nonstandard PNG unsupported")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")
    scan = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = scan[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels
    for y in range(h):
        f = int(filters[y])
        line = scan[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(
            stride, np.int32
        )
        if f == 0:
            rec = line
        elif f == 2:  # Up: no intra-line recurrence — fully vectorized
            rec = (line + prev) & 0xFF
        elif f in (1, 3, 4):
            ln = line.reshape(w, bpp)
            pv = prev.reshape(w, bpp)
            rc = np.zeros((w, bpp), np.int32)
            a = np.zeros(bpp, np.int32)  # left pixel (reconstructed)
            c = np.zeros(bpp, np.int32)  # upper-left pixel
            for x in range(w):
                b = pv[x]
                if f == 1:  # Sub
                    rc[x] = (ln[x] + a) & 0xFF
                elif f == 3:  # Average
                    rc[x] = (ln[x] + ((a + b) >> 1)) & 0xFF
                else:  # Paeth
                    p = a + b - c
                    pa = np.abs(p - a)
                    pb = np.abs(p - b)
                    pc = np.abs(p - c)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                    )
                    rc[x] = (ln[x] + pred) & 0xFF
                a = rc[x]
                c = b
            rec = rc.reshape(stride)
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec.astype(np.uint8)
    if channels == 1:
        return out.reshape(h, w)
    return out.reshape(h, w, channels)


def decode_audio_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL RIFF/WAVE PCM-16 decode (pure struct/numpy): returns
    ``(samples int16 array, sample_rate)``. Walks the chunk list, so extra
    chunks (LIST, fact) are tolerated; only format 1 (PCM) 16-bit is
    supported — honest scope for a codec-free container."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = None
    bits = None
    fmt_code = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_code, _ch, sample_rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if data is None or sample_rate is None:
        raise ValueError("missing fmt/data chunk")
    if fmt_code != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM-16 supported (fmt={fmt_code}, bits={bits})"
        )
    return np.frombuffer(data, dtype="<i2"), sample_rate


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


def _ppm_payload(media_id: int) -> tuple[bytes, int, int]:
    """Deterministic real P6 payload: integer pixel pattern, no RNG."""
    w = 8 + (media_id % 4) * 4
    h = 8
    yy, xx, cc = np.meshgrid(
        np.arange(h), np.arange(w), np.arange(3), indexing="ij"
    )
    pix = ((xx * 3 + yy * 7 + media_id * 11 + cc * 5) % 256).astype(np.uint8)
    return b"P6\n%d %d\n255\n" % (w, h) + pix.tobytes(), w, h


def _wav_payload(media_id: int) -> tuple[bytes, int]:
    """Deterministic real PCM-16 WAV payload (integer waveform, no RNG)."""
    rate = 8000
    n = 64 + (media_id % 8) * 16
    i = np.arange(n, dtype=np.int64)
    samples = ((i * i * 13 + media_id * 29) % 4001 - 2000).astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    payload = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return payload, (n * 1000) // rate


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png_payload(media_id: int) -> tuple[bytes, int, int]:
    """Deterministic real PNG payload (integer pixel pattern, no RNG).
    Rows cycle through ALL five scanline filter types so the decoder's
    filter reconstruction is exercised end-to-end; alternates RGB/RGBA.
    Filtering an encoder scanline uses RAW neighbors (no recurrence), so
    it vectorizes cleanly — unlike decode."""
    w = 8 + (media_id % 4) * 4
    h = 10
    channels = 4 if media_id % 2 else 3
    yy, xx, cc = np.meshgrid(
        np.arange(h), np.arange(w), np.arange(channels), indexing="ij"
    )
    pix = ((xx * 5 + yy * 3 + media_id * 7 + cc * 11) % 256).astype(np.uint8)
    raw = pix.reshape(h, w * channels).astype(np.int32)
    bpp = channels
    lines: list[bytes] = []
    for y in range(h):
        f = y % 5
        cur = raw[y]
        prev = raw[y - 1] if y > 0 else np.zeros_like(cur)
        a = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        b = prev
        c = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if f == 0:
            flt = cur
        elif f == 1:
            flt = cur - a
        elif f == 2:
            flt = cur - b
        elif f == 3:
            flt = cur - ((a + b) >> 1)
        else:
            p = a + b - c
            pa = np.abs(p - a)
            pb = np.abs(p - b)
            pc = np.abs(p - c)
            pred = np.where(
                (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
            )
            flt = cur - pred
        lines.append(bytes([f]) + (flt & 0xFF).astype(np.uint8).tobytes())
    ihdr = struct.pack(
        ">IIBBBBB", w, h, 8, 6 if channels == 4 else 2, 0, 0, 0
    )
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _png_chunk(b"IEND", b"")
    )
    return payload, w, h


def synth_real_media(spark: SparkSession, n: int = 200) -> DataFrame:
    """Media table whose payloads are GENUINE encoded files (P6 PPM and
    PNG images, PCM-16 WAV audio) built from deterministic integer
    patterns — the real decoders run end-to-end on them with no codec
    library. Arrow-batched generation (fixture synthesis, not an operator
    under test)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                sel = mid % 3
                if sel == 0:
                    payload, w, h = _ppm_payload(mid)
                    rows.append(
                        (mid, "image", payload, "image/x-portable-pixmap",
                         w, h, None)
                    )
                elif sel == 1:
                    payload, dur = _wav_payload(mid)
                    rows.append(
                        (mid, "audio", payload, "audio/wav", None, None, dur)
                    )
                else:
                    payload, w, h = _png_payload(mid)
                    rows.append(
                        (mid, "image", payload, "image/png", w, h, None)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "payload", "mime",
                    "width", "height", "duration_ms",
                ],
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


DECODE_STATS_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_values", LongType()),
    StructField("value_sum", LongType()),
    StructField("decoded_md5", StringType()),
    StructField("error_code", StringType()),
])


def media_decode_stats(media: DataFrame) -> DataFrame:
    """REAL decode per media row (PPM/PNG → pixel array, WAV → sample
    array) with exact integer stats + an md5 over the decoded bytes — a
    bit-exact pin of the whole decode, mirrored by an INDEPENDENT parser
    in the golden generator. Integer sums only → engine-portable oracle.

    One corrupt payload must degrade to ONE quarantined row, not a failed
    job: per-row decode errors surface as ``error_code`` (the exception
    class name — deterministic, message-free) with null stats, matching
    the extraction pipeline's error-row philosophy."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                raw = bytes(payload) if payload is not None else b""
                try:
                    if kind == "image":
                        arr = decode_image(raw)
                        h, w = arr.shape[0], arr.shape[1]
                        rows.append(
                            (int(mid), kind, w, h, int(arr.size),
                             int(arr.astype(np.int64).sum()),
                             hashlib.md5(arr.tobytes()).hexdigest(), None)
                        )
                    else:
                        samples, _rate = decode_audio_wav(raw)
                        rows.append(
                            (int(mid), kind, None, None, int(samples.size),
                             int(samples.astype(np.int64).sum()),
                             hashlib.md5(samples.tobytes()).hexdigest(),
                             None)
                        )
                except Exception as exc:  # noqa: BLE001 — quarantine row
                    rows.append(
                        (int(mid), kind, None, None, None, None, None,
                         type(exc).__name__)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "width", "height",
                    "n_values", "value_sum", "decoded_md5", "error_code",
                ],
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        kernel, schema=DECODE_STATS_SCHEMA
    )

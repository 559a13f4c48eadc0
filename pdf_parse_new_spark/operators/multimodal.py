"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

Decode tiers:

- **Uncompressed formats decode for REAL** (pure numpy, no codec libs):
  binary PPM (P6) images and WAV/PCM-16 audio. Features are real too — a
  4x4 mean-luminance grid for images (a dHash-style perceptual sketch) and
  16 RMS-energy windows for audio.
- Compressed formats (JPEG/PNG/H.264...) need codec libraries this
  container lacks, so their decode is a seeded, shape-correct deterministic
  stand-in behind ``DETERMINISTIC_FAKE`` — swap in PIL/ffmpeg in a full
  environment. The Spark-side plumbing (schemas, Arrow batching,
  partitioning, UDF signatures) is identical either way and fully tested.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta map<string,string>"
)

FEATURE_SCHEMA = (
    "media_id string, kind string, width int, height int, "
    "n_frames int, feature array<float>"
)

DETERMINISTIC_FAKE = True
_FEAT_DIM = 16


def _decode_ppm(payload: bytes) -> tuple[int, int, int, np.ndarray] | None:
    """REAL decode of a binary PPM (P6) image: header parse + numpy pixel
    grid -> (w, h, 1, 4x4 mean-luminance feature in [0,1])."""
    if not payload.startswith(b"P6"):
        return None
    # header: "P6" <ws> W <ws> H <ws> MAXVAL <single ws> raster
    fields: list[int] = []
    pos = 2
    while len(fields) < 3 and pos < len(payload):
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment line
            nl = payload.find(b"\n", pos)
            pos = nl + 1 if nl >= 0 else len(payload)
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        try:
            fields.append(int(payload[start:pos]))
        except ValueError:
            return None
    if len(fields) < 3:
        return None
    w, h, maxval = fields
    pos += 1  # the single whitespace after MAXVAL
    if w <= 0 or h <= 0 or maxval <= 0 or w * h > 64_000_000:
        return None
    raster = np.frombuffer(payload, dtype=np.uint8, count=-1, offset=pos)
    if raster.size < w * h * 3:
        return None
    rgb = raster[: w * h * 3].reshape(h, w, 3).astype(np.float32)
    # Rec.601 luminance, then a 4x4 grid of block means (perceptual sketch)
    lum = rgb @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
    ys = np.array_split(np.arange(h), 4)
    xs = np.array_split(np.arange(w), 4)
    feat = np.array(
        [lum[np.ix_(yy, xx)].mean() for yy in ys for xx in xs],
        dtype=np.float32,
    ) / float(maxval)
    return w, h, 1, feat


def _decode_bmp(payload: bytes) -> tuple[int, int, int, np.ndarray] | None:
    """REAL decode of an uncompressed 24-bit BMP (BI_RGB, the format
    screenshots and exports most commonly use uncompressed): BITMAPINFO
    header + numpy pixel grid with 4-byte row padding and bottom-up row
    order -> the same 4x4 mean-luminance feature as the PPM path."""
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    (data_off,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size < 40 or len(payload) < 18 + 36:
        return None
    w, h_raw = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if planes != 1 or bpp != 24 or compression != 0:
        return None  # only uncompressed 24-bit decodes for real
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h <= 0 or w * h > 64_000_000:
        return None
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    need = data_off + stride * h
    if len(payload) < need:
        return None
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * 3]
    bgr = rows.reshape(h, w, 3).astype(np.float32)
    if not top_down:
        bgr = bgr[::-1]  # bottom-up storage
    lum = bgr @ np.array([0.114, 0.587, 0.299], dtype=np.float32)  # B,G,R
    ys = np.array_split(np.arange(h), 4)
    xs = np.array_split(np.arange(w), 4)
    feat = np.array(
        [lum[np.ix_(yy, xx)].mean() for yy in ys for xx in xs],
        dtype=np.float32,
    ) / 255.0
    return w, h, 1, feat


def _decode_wav(payload: bytes) -> tuple[int, int, int, np.ndarray] | None:
    """REAL decode of WAV/PCM-16: RIFF header + numpy samples -> 16 RMS
    energy windows. (w, h) report (sample_rate, n_channels)."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_fmt, n_ch, rate = struct.unpack("<HHI", fmt[:8])
    (bits,) = struct.unpack("<H", fmt[14:16])
    if audio_fmt != 1 or bits != 16 or n_ch < 1:
        return None  # only uncompressed PCM-16 decodes for real
    samples = np.frombuffer(
        data[: len(data) - (len(data) % 2)], dtype="<i2"
    ).astype(np.float32) / 32768.0
    if samples.size == 0:
        return None
    windows = np.array_split(samples, _FEAT_DIM)
    feat = np.array(
        [np.sqrt(np.mean(wd * wd)) if wd.size else 0.0 for wd in windows],
        dtype=np.float32,
    )
    n_frames = samples.size // n_ch
    return int(rate), int(n_ch), n_frames, feat


def _fake_decode(payload: bytes, kind: str) -> tuple[int, int, int, np.ndarray]:
    """Deterministic stand-in for compressed codecs: derives (w, h, frames,
    feature) purely from the payload bytes. Replace with PIL/ffmpeg in a
    full env."""
    if not DETERMINISTIC_FAKE:
        raise NotImplementedError("no image/audio codecs in this container")
    h = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8).astype(
        np.float32
    )
    rng = int(h.sum()) % 97
    w, ht = 16 + rng % 64, 16 + (rng * 7) % 64
    frames = 1 if kind == "image" else 1 + rng % 30
    feat = np.resize(h, _FEAT_DIM) / 255.0
    return w, ht, frames, feat


def _decode(payload: bytes, kind: str) -> tuple[int, int, int, np.ndarray]:
    real = _decode_ppm(payload)
    if real is None:
        real = _decode_bmp(payload)
    if real is None:
        real = _decode_wav(payload)
    if real is not None:
        return real
    return _fake_decode(payload, kind)


def extract_features(df: DataFrame, batch_frames: int = 4) -> DataFrame:
    """decode -> feature-extract -> (for video/audio) frame-sample, batched.

    Real plumbing: Arrow delivers the binary column zero-copy; the UDF loops
    only over rows of the batch calling the decoder (numpy for the real
    uncompressed paths)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h, nf, feats = [], [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                wi, hi, fi, ft = _decode(bytes(payload or b""), kind)
                w.append(wi)
                h.append(hi)
                nf.append(min(fi, batch_frames) if kind != "audio" else fi)
                feats.append(ft.tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": pd.array(w, dtype="int32"),
                    "height": pd.array(h, dtype="int32"),
                    "n_frames": pd.array(nf, dtype="int32"),
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)

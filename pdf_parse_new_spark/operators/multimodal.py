"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is stubbed
behind ``DETERMINISTIC_FAKE`` (a seeded, shape-correct stand-in) /
``NotImplementedError`` — but the Spark-side plumbing is real and tested:
schemas, batch iteration, partitioning, and the UDF signatures are exactly
what a codec-backed implementation would use.
"""

from __future__ import annotations

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


def _fake_decode(payload: bytes, kind: str) -> tuple[int, int, int, np.ndarray]:
    """Deterministic stand-in for the codec: derives (w, h, frames, feature)
    purely from the payload bytes. Replace with PIL/ffmpeg in a full env."""
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


def extract_features(df: DataFrame, batch_frames: int = 4) -> DataFrame:
    """decode -> feature-extract -> (for video) frame-sample, batched.

    Real plumbing: Arrow delivers the binary column zero-copy; the UDF loops
    only over rows of the batch calling the (C-speed, in a real env) decoder.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h, nf, feats = [], [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                wi, hi, fi, ft = _fake_decode(bytes(payload or b""), kind)
                w.append(wi)
                h.append(hi)
                nf.append(min(fi, batch_frames))  # frame-sample cap
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

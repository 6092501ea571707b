"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video are carried as ``binary`` columns with a ``kind`` tag and
a string metadata map.  The Spark-side plumbing — schema, partitioning,
Arrow batch shapes, vectorized UDF signatures — is real and tested; the
actual media decode is STUBBED (the sandbox has no image/audio libraries):
``decode_media`` raises ``NotImplementedError`` unless ``fake=True``, in
which case a deterministic fake decoder (byte-histogram features, md5-seeded
dimensions) stands in so the distributed dataflow can be exercised end to
end at any scale.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, meta map<string,string>"
)
FEATURE_DIM = 16


def decode_media(payload: bytes, kind: str, fake: bool = False):
    """Decode one media payload -> (width, height, channels).

    Real decode requires PIL/ffmpeg (not in this container) — gated stub."""
    if not fake:
        raise NotImplementedError(
            "media decode requires image/audio libraries not present in this "
            "environment; pass fake=True for the deterministic stand-in"
        )
    h = hashlib.md5(payload).digest()
    return (64 + h[0] % 192, 64 + h[1] % 192, 1 + h[2] % 4)


def _features_one(payload: bytes) -> np.ndarray:
    """Deterministic FEATURE_DIM-dim feature vector: normalized byte
    histogram folded to FEATURE_DIM buckets (stands in for a real image
    embedding; vectorized numpy, no per-byte Python)."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype(np.float64)
    return (hist / arr.size).astype(np.float32)


def extract_features(df, fake: bool = True):
    """media df -> (media_id, kind, width, height, channels, features).

    mapInPandas keeps Arrow batches columnar; repartition upstream by
    media_id for balanced decode work at scale."""
    out_schema = (
        "media_id long, kind string, width int, height int, channels int, "
        "features array<float>"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [decode_media(p, k, fake=fake)
                    for p, k in zip(pdf["payload"], pdf["kind"])]
            feats = [_features_one(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "width": [d[0] for d in dims],
                "height": [d[1] for d in dims],
                "channels": [d[2] for d in dims],
                "features": feats,
            })

    return df.mapInPandas(run, schema=out_schema)


def frame_sample(df, every_n_bytes: int = 1024, max_frames: int = 8,
                 fake: bool = True):
    """Video-style frame sampling: slice the payload into fixed-stride
     'frames' and emit one row per sampled frame (payload chunk + index).
    Real frame extraction would use ffmpeg; the slicing dataflow (row
    explosion inside mapInPandas, bounded output) is the part that matters
    for scale and is real."""
    if not fake:
        raise NotImplementedError("real frame extraction requires ffmpeg")
    out_schema = "media_id long, frame_id int, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fids, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i in range(0, min(max_frames, max(1, len(payload) // every_n_bytes))):
                    ids.append(mid)
                    fids.append(i)
                    frames.append(bytes(payload[i * every_n_bytes:(i + 1) * every_n_bytes]))
            yield pd.DataFrame({"media_id": ids, "frame_id": fids, "frame": frames})

    return df.mapInPandas(run, schema=out_schema)

"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video are carried as ``binary`` columns with a ``kind`` tag and
a string metadata map.  The Spark-side plumbing — schema, partitioning,
Arrow batch shapes, vectorized UDF signatures — is real and tested.

Decode is import-guarded, best-real-first:

- ``kind="image"``: PIL when installed (any format PIL reads); otherwise a
  pure-stdlib PNG IHDR parse (a REAL decode of real PNG metadata — works in
  library-free environments).  Other formats without PIL raise.
- ``kind="audio"``: stdlib ``wave`` for RIFF/WAVE payloads — returns
  (n_frames, sample_rate, channels) in the (width, height, channels) slots.
- ``kind="video"``: a pure-stdlib ISO-BMFF (MP4/MOV) box walker reads real
  container metadata — track dimensions from ``tkhd`` (16.16 fixed point)
  and the track count — returning (width, height, n_tracks).  FRAME
  extraction (actual codec decode) still requires ffmpeg and stays a
  disclosed stub (``frame_sample(fake=True)`` slices byte-stride
  pseudo-frames so the row-explosion dataflow is exercised end to end).

``fake=True`` selects a deterministic fake decoder (byte-histogram
features, md5-seeded dimensions) for tests and benchmarks that need decode
output at any scale without real media bytes.
"""

from __future__ import annotations

import hashlib
import io
import struct
from typing import Iterator

import numpy as np
import pandas as pd

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, meta map<string,string>"
)
FEATURE_DIM = 16


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type -> sample channels (spec §11.2.2); palette decodes to 1
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _decode_image(payload: bytes):
    try:
        from PIL import Image  # real decoder when the library is present

        with Image.open(io.BytesIO(payload)) as im:
            return int(im.width), int(im.height), len(im.getbands())
    except ImportError:
        pass
    # stdlib fallback: PNG IHDR (always the first chunk, at byte 8)
    if payload[:8] == _PNG_SIG and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        channels = _PNG_CHANNELS.get(payload[25])
        if channels:
            return int(w), int(h), channels
    raise NotImplementedError(
        "image decode requires PIL for non-PNG formats (not installed); "
        "PNG payloads decode via the stdlib path; pass fake=True for the "
        "deterministic stand-in"
    )


def _decode_audio(payload: bytes):
    import wave

    try:
        with wave.open(io.BytesIO(payload)) as w:
            return (int(w.getnframes()), int(w.getframerate()),
                    int(w.getnchannels()))
    except (wave.Error, EOFError) as e:
        raise NotImplementedError(
            f"audio decode supports RIFF/WAVE via stdlib wave ({e}); other "
            "codecs need soundfile/ffmpeg (not installed); pass fake=True "
            "for the deterministic stand-in"
        ) from e


def _walk_boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, box_end) for each ISO-BMFF box in
    buf[start:end] (ISO/IEC 14496-12 §4.2: 32-bit size + 4-char type,
    size==1 -> 64-bit largesize, size==0 -> box extends to end)."""
    off = start
    while off + 8 <= end:
        size, btype = struct.unpack(">I4s", buf[off:off + 8])
        hdr = 8
        if size == 1:
            if off + 16 > end:
                return
            size = struct.unpack(">Q", buf[off + 8:off + 16])[0]
            hdr = 16
        elif size == 0:
            size = end - off
        if size < hdr or off + size > end:
            return  # truncated/corrupt box: stop walking
        yield btype, off + hdr, off + size
        off += size


def _decode_video(payload: bytes):
    """Pure-stdlib ISO-BMFF (MP4/MOV) container metadata: the first track
    with nonzero tkhd dimensions gives (width, height); the third slot
    carries the total track count.  Raises for non-BMFF payloads (real
    codec work needs ffmpeg)."""
    # any top-level box type a real file can START with qualifies —
    # unoptimized/progressive layouts lead with wide/free/skip/mdat and
    # put moov last (ISO 14496-12 imposes no box order)
    is_bmff = len(payload) >= 12 and payload[4:8] in (
        b"ftyp", b"moov", b"wide", b"free", b"skip", b"mdat")
    if is_bmff:
        moov = next((b for b in _walk_boxes(payload, 0, len(payload))
                     if b[0] == b"moov"), None)
        if moov is not None:
            n_tracks, w, h = 0, 0, 0
            for btype, bs, be in _walk_boxes(payload, moov[1], moov[2]):
                if btype != b"trak":
                    continue
                n_tracks += 1
                tkhd = next((b for b in _walk_boxes(payload, bs, be)
                             if b[0] == b"tkhd"), None)
                if tkhd is None or (w and h):
                    continue
                # tkhd (§8.3.2): width/height are the LAST 8 body bytes,
                # 16.16 fixed point, same offset for version 0 and 1
                tw, th = struct.unpack(">II", payload[tkhd[2] - 8:tkhd[2]])
                w, h = tw >> 16, th >> 16
            if n_tracks:
                return int(w), int(h), int(n_tracks)
    raise NotImplementedError(
        "video decode supports ISO-BMFF (MP4/MOV) container metadata via "
        "the stdlib box walker; other containers and actual frame decode "
        "need ffmpeg (not installed); pass fake=True for the deterministic "
        "stand-in"
    )


def decode_media(payload: bytes, kind: str, fake: bool = False):
    """Decode one media payload -> (width, height, channels); for audio the
    triple carries (n_frames, sample_rate, channels).

    Import-guarded real decode first (PIL -> stdlib PNG/WAV parsers, see
    module docstring); ``fake=True`` selects the deterministic stand-in."""
    if fake:
        h = hashlib.md5(payload).digest()
        return (64 + h[0] % 192, 64 + h[1] % 192, 1 + h[2] % 4)
    if kind == "image":
        return _decode_image(payload)
    if kind == "audio":
        return _decode_audio(payload)
    if kind == "video":
        return _decode_video(payload)
    raise NotImplementedError(
        f"real decode for kind={kind!r} is not supported; "
        "pass fake=True for the deterministic stand-in"
    )


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

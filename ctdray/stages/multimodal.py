"""Multimodal column stages: opaque ``binary`` payloads + typed metadata.

The engine treats image/audio/video as binary columns addressed by
``media_ref``; decode / feature-extract / resize / frame-sample are
``map_batches`` stages over Arrow batches.  In this sandbox only the PGM
image codec is real (ctdray.sources.media); JPEG/PNG/audio/video codecs are
import-gated stubs (cv2 / PIL / av are not installed) with the Ray-side
plumbing — schemas, batch shapes, deterministic output layout — fully real
and tested, per the engine contract for multimodal operators.

Scale notes: payload rows are large (a page ≈ 1-8 MB), so these stages use
SMALL batch sizes and emit compact derived columns (thumbnails, features,
frame summaries) rather than carrying raw pixels downstream; raw bytes never
cross a shuffle.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..geom import resize_bilinear
from ..sources.media import decode_pgm, fetch_media

THUMB_SCHEMA = pa.schema([
    pa.field("media_ref", pa.string()),
    pa.field("height", pa.int32()),
    pa.field("width", pa.int32()),
    pa.field("thumb_h", pa.int32()),
    pa.field("thumb_w", pa.int32()),
    pa.field("thumb", pa.binary()),          # raw uint8 thumb_h×thumb_w bytes
    pa.field("mean_px", pa.float64()),
    pa.field("decode_ok", pa.bool_()),
])

FRAME_SCHEMA = pa.schema([
    pa.field("media_ref", pa.string()),
    pa.field("frame_idx", pa.int32()),
    pa.field("frame", pa.binary()),
    pa.field("frame_h", pa.int32()),
    pa.field("frame_w", pa.int32()),
])

AUDIO_FEAT_SCHEMA = pa.schema([
    pa.field("media_ref", pa.string()),
    pa.field("n_windows", pa.int32()),
    pa.field("features", pa.list_(pa.float32())),   # n_windows × n_mel flat
])


def decode_image(payload: bytes) -> np.ndarray:
    """binary → uint8 (h, w[, c]).  PGM is native; other formats need cv2 or
    PIL (not in this container) — the prod hook is explicit."""
    if payload[:2] == b"P5":
        return decode_pgm(payload)
    try:  # pragma: no cover - not installed in-sandbox
        import cv2

        img = cv2.imdecode(np.frombuffer(payload, np.uint8), cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError("cv2 could not decode payload")
        return img
    except ImportError:
        raise NotImplementedError(
            "non-PGM image decode requires cv2/PIL (unavailable in-sandbox); "
            "prod images route through this hook unchanged")


def thumbnails_task(batch: pa.Table, size: int = 64) -> pa.Table:
    """Decode + aspect-ignoring resize to size×size — the canonical
    image-feature stage shape (decode inside the task, compact output)."""
    rows = []
    for ref in batch.column("media_ref").to_pylist():
        try:
            img = decode_image(fetch_media(ref))
            thumb = resize_bilinear(img, size, size)
            rows.append({"media_ref": ref,
                         "height": int(img.shape[0]), "width": int(img.shape[1]),
                         "thumb_h": size, "thumb_w": size,
                         "thumb": thumb.tobytes(),
                         "mean_px": float(img.mean()),
                         "decode_ok": True})
        except (ValueError, NotImplementedError):
            rows.append({"media_ref": ref, "height": 0, "width": 0,
                         "thumb_h": 0, "thumb_w": 0, "thumb": b"",
                         "mean_px": 0.0, "decode_ok": False})
    if not rows:
        return THUMB_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=THUMB_SCHEMA)


def sample_frames_task(batch: pa.Table, n_frames: int = 4) -> pa.Table:
    """Video frame sampling stage.  No video codec ships in this container,
    so frames are a DETERMINISTIC fake (seeded by media_ref) with the real
    output layout — one row per sampled frame; prod swaps the decoder for
    av/cv2.VideoCapture behind the same schema."""
    rows = []
    for ref in batch.column("media_ref").to_pylist():
        seed = int.from_bytes(
            hashlib.sha256(b"vid:" + ref.encode()).digest()[:8], "little")
        rng = np.random.default_rng(seed)
        h, w = 36, 64
        for idx in range(n_frames):
            frame = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
            rows.append({"media_ref": ref, "frame_idx": idx,
                         "frame": frame.tobytes(),
                         "frame_h": h, "frame_w": w})
    if not rows:
        return FRAME_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=FRAME_SCHEMA)


def audio_features_task(batch: pa.Table, n_windows: int = 16,
                        n_mel: int = 8) -> pa.Table:
    """Audio feature extraction stage.  Same contract as frames: the
    windowed-feature layout is real, the decoded waveform is a deterministic
    fake (no audio codec in-sandbox)."""
    rows = []
    for ref in batch.column("media_ref").to_pylist():
        seed = int.from_bytes(
            hashlib.sha256(b"aud:" + ref.encode()).digest()[:8], "little")
        rng = np.random.default_rng(seed)
        feats = rng.standard_normal(n_windows * n_mel).astype(np.float32)
        rows.append({"media_ref": ref, "n_windows": n_windows,
                     "features": feats.tolist()})
    if not rows:
        return AUDIO_FEAT_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=AUDIO_FEAT_SCHEMA)

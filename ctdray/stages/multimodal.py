"""Multimodal column stages: opaque ``binary`` payloads + typed metadata.

The engine treats image/audio/video as binary columns addressed by
``media_ref``; decode / feature-extract / resize / frame-sample are
``map_batches`` stages over Arrow batches.  Every decode here is REAL:
PGM and PNG images (pure numpy/zlib — ctdray.sources.png), CTVF raw-frame
video and RIFF/WAVE PCM16 audio (ctdray.sources.media).  JPEG would need
cv2/PIL (not in this container) and routes through the explicit prod hook.

Scale notes: payload rows are large (a page ≈ 1-8 MB), so these stages use
SMALL batch sizes and emit compact derived columns (thumbnails, features,
frame summaries) rather than carrying raw pixels downstream; raw bytes never
cross a shuffle.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import resize_bilinear
from ..sources.media import decode_ctvf, decode_pgm, decode_wav, fetch_media
from ..sources.png import decode_png

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


def _decode_checked(fn, payload: bytes, what: str) -> np.ndarray:
    """Run a native decoder, normalizing every malformed-stream escape
    (bit-flipped lengths → IndexError, corrupted table ids → KeyError,
    zlib garbage, …) to the poison-pill contract's ValueError.  Fuzz-pinned
    by tests/test_decode_fuzz.py: decode_image raises ONLY
    ValueError/NotImplementedError, whatever the bytes."""
    import struct
    import zlib

    try:
        return fn(payload)
    except (ValueError, NotImplementedError):
        raise
    except (IndexError, KeyError, OverflowError, TypeError,
            StopIteration, struct.error, zlib.error) as e:
        raise ValueError(
            f"malformed {what} payload: {type(e).__name__}: {e}") from e


def decode_image(payload: bytes) -> np.ndarray:
    """binary → uint8 (h, w[, c]).  The pure-python codec matrix decodes
    natively: PGM/PPM, PNG (all filters + Adam7 interlace), JPEG — baseline
    AND progressive (SOF2) — BMP, TIFF (uncompressed + LZW w/ predictor),
    GIF (full variable-width LZW).  The reference decodes via cv2.imdecode
    (utils/io_utils.py:42); cv2, when importable, takes the fast path and
    covers the remaining formats (WebP, AVIF, …)."""
    if payload[:2] == b"P5":
        return _decode_checked(decode_pgm, payload, "PGM")
    if payload[:2] == b"P6":
        from ..sources.media import decode_ppm

        return _decode_checked(decode_ppm, payload, "PPM")
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_checked(decode_png, payload, "PNG")
    if payload[:2] == b"BM":
        from ..sources.bmp import decode_bmp

        return _decode_checked(decode_bmp, payload, "BMP")
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from ..sources.tiff import decode_tiff

        return _decode_checked(decode_tiff, payload, "TIFF")
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from ..sources.gif import decode_gif

        return _decode_checked(decode_gif, payload, "GIF")
    try:  # pragma: no cover - not installed in-sandbox
        import cv2

        img = cv2.imdecode(np.frombuffer(payload, np.uint8), cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError("cv2 could not decode payload")
        return img
    except ImportError:
        if payload[:2] == b"\xff\xd8":
            from ..sources.jpeg import decode_jpeg

            return _decode_checked(decode_jpeg, payload, "JPEG")
        raise NotImplementedError(
            "image format needs cv2/PIL (unavailable in-sandbox); "
            "prod images route through this hook unchanged")


def probe_image_dims(payload: bytes) -> tuple[int, int]:
    """Header-only (h, w) probe — same magic dispatch and poison-pill
    contract as :func:`decode_image`, but no pixel decode: each codec
    parses only its header (PNM tokens, PNG IHDR, BMP info header, TIFF
    IFD, GIF screen descriptor, JPEG SOF scan) and applies the same
    header-level support checks, so an unsupported variant poison-pills at
    probe time exactly as it would at decode time.  Deep body corruption
    (valid header, bad pixel stream) is by design NOT detected here — the
    pixel-consuming stage downstream degrades on it instead.  Unknown
    formats raise NotImplementedError so callers can fall back to the full
    :func:`decode_image` (which may route through cv2 when available)."""
    if payload[:2] in (b"P5", b"P6"):
        from ..sources.media import _pnm_header_ex

        def _pnm_dims(data):
            w, h, _maxval, _pos = _pnm_header_ex(data)
            return h, w
        return _decode_checked(_pnm_dims, payload, "PNM")
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from ..sources.png import probe_dims

        return _decode_checked(probe_dims, payload, "PNG")
    if payload[:2] == b"BM":
        from ..sources.bmp import probe_dims

        return _decode_checked(probe_dims, payload, "BMP")
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from ..sources.tiff import probe_dims

        return _decode_checked(probe_dims, payload, "TIFF")
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from ..sources.gif import probe_dims

        return _decode_checked(probe_dims, payload, "GIF")
    if payload[:2] == b"\xff\xd8":
        from ..sources.jpeg import probe_dims

        return _decode_checked(probe_dims, payload, "JPEG")
    raise NotImplementedError(
        "image format has no header probe; fall back to decode_image")


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
    """Video frame sampling: REAL container decode (CTVF raw frames —
    sources.media.decode_ctvf) → n uniformly-spaced frames per clip, one
    output row each.  Prod swaps the decoder for av/cv2.VideoCapture behind
    the same schema; undecodable payloads degrade to zero rows."""
    rows = []
    for ref in batch.column("media_ref").to_pylist():
        try:
            frames = decode_ctvf(fetch_media(ref))
        except ValueError:
            continue
        n_total = frames.shape[0]
        picks = np.linspace(0, n_total - 1, min(n_frames, n_total)).astype(int)
        for idx in picks:
            fr = frames[idx]
            rows.append({"media_ref": ref, "frame_idx": int(idx),
                         "frame": fr.tobytes(),
                         "frame_h": int(fr.shape[0]),
                         "frame_w": int(fr.shape[1])})
    if not rows:
        return FRAME_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=FRAME_SCHEMA)


def audio_features_task(batch: pa.Table, n_windows: int = 16,
                        n_bands: int = 8) -> pa.Table:
    """Audio feature extraction: REAL WAV decode (stdlib wave →
    sources.media.decode_wav) → per-window log band energies via numpy
    rFFT (a mel-style filterbank without the mel warp — no scipy needed).
    Output: n_windows × n_bands flat float32 features per clip."""
    rows = []
    for ref in batch.column("media_ref").to_pylist():
        try:
            samples, _sr = decode_wav(fetch_media(ref))
        except ValueError:
            continue
        if samples.size < n_windows:
            continue
        win = samples.size // n_windows
        frames = samples[:win * n_windows].reshape(n_windows, win)
        spec = np.abs(np.fft.rfft(frames * np.hanning(win), axis=1)) ** 2
        # fold the spectrum into n_bands equal-width bands
        nb = spec.shape[1] // n_bands * n_bands
        bands = spec[:, :nb].reshape(n_windows, n_bands, -1).sum(axis=2)
        feats = np.log1p(bands).astype(np.float32).reshape(-1)
        rows.append({"media_ref": ref, "n_windows": n_windows,
                     "features": feats.tolist()})
    if not rows:
        return AUDIO_FEAT_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=AUDIO_FEAT_SCHEMA)

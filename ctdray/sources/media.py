"""Media store: media_ref → encoded page bytes, plus a pure-numpy PGM codec.

The reference reads image files with cv2.imdecode (utils/io_utils.py:42) and
writes them with cv2.imencode (utils/io_utils.py:47-53).  In this engine a
page is an opaque ``binary`` payload addressed by ``media_ref``; the sandbox
store *synthesizes* the bytes deterministically from the ref (standing in for
an object-store / Lance-blob fetch — no external data allowed), and the codec
is binary PGM (P5), a public format trivially parsed with numpy.  A prod
deployment swaps ``fetch_media`` for a real object-store read and the codec
for cv2 — the pipeline plumbing (bytes column in, uint8 image out, decoded
inside ``map_batches``) is identical.
"""
from __future__ import annotations

import numpy as np

from ..fixtures import page_ground_truth, render_page


def encode_pgm(img: np.ndarray) -> bytes:
    """Grayscale uint8 (h, w) → binary PGM (P5)."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("encode_pgm expects a 2-D uint8 array")
    h, w = img.shape
    header = f"P5\n{w} {h}\n255\n".encode("ascii")
    # join copies the pixel buffer ONCE (straight from the array's
    # memoryview); ``header + img.tobytes()`` paid two full-payload copies.
    if not img.flags.c_contiguous:
        img = np.ascontiguousarray(img)
    return b"".join((header, img.data))


def decode_pgm(data: bytes) -> np.ndarray:
    """Binary PGM (P5) → uint8 (h, w).  Raises ValueError on malformed input
    (callers turn this into an error row, never a crash — SURVEY.md §4
    poison-pill handling)."""
    if data.startswith(b"P6"):         # binary PPM (color sibling)
        return decode_ppm(data)
    if not data.startswith(b"P5"):
        raise ValueError("not a binary PGM (P5) payload")
    w, h, maxval, pos = _pnm_header_ex(data)
    if maxval > 255:                   # two-byte samples → high byte
        pixels = np.frombuffer(data, dtype=">u2", count=h * w, offset=pos)
        if pixels.size != h * w:
            raise ValueError("truncated PGM pixel data")
        return (pixels >> 8).astype(np.uint8).reshape(h, w)
    pixels = np.frombuffer(data, dtype=np.uint8, count=h * w, offset=pos)
    if pixels.size != h * w:
        raise ValueError("truncated PGM pixel data")
    return pixels.reshape(h, w).copy()


def encode_ppm(img: np.ndarray) -> bytes:
    """BGR uint8 (h, w, 3) → binary PPM (P6, stored RGB per the format)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_ppm expects a (h, w, 3) uint8 array")
    h, w = img.shape[:2]
    header = f"P6\n{w} {h}\n255\n".encode("ascii")
    return b"".join((header, np.ascontiguousarray(img[:, :, ::-1]).data))


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) → uint8 (h, w, 3) BGR (the cv2 channel convention
    every other decoder here follows)."""
    if not data.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    w, h, maxval, pos = _pnm_header_ex(data)
    if maxval > 255:                   # two-byte samples → high byte
        px = np.frombuffer(data, dtype=">u2", count=h * w * 3, offset=pos)
        if px.size != h * w * 3:
            raise ValueError("truncated PPM pixel data")
        return (px >> 8).astype(np.uint8).reshape(h, w, 3)[:, :, ::-1].copy()
    pixels = np.frombuffer(data, dtype=np.uint8, count=h * w * 3, offset=pos)
    if pixels.size != h * w * 3:
        raise ValueError("truncated PPM pixel data")
    return pixels.reshape(h, w, 3)[:, :, ::-1].copy()


def _pnm_header(data: bytes) -> tuple[int, int, int]:
    """Shared P5/P6 header parse → (w, h, pixel offset); comments allowed;
    maxval must be 255 (the 1-byte corpus format).  Raises ValueError on
    malformed headers.  16-bit files go through :func:`_pnm_header_ex`."""
    tokens: list[bytes] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos:pos + 1] == b"#":
            while pos < len(data) and data[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PNM header")
        tokens.append(data[start:pos])
    pos += 1  # single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"unsupported PNM maxval {maxval}")
    if w <= 0 or h <= 0 or w > 1 << 20 or h > 1 << 20:
        raise ValueError("invalid PNM dimensions")
    return w, h, pos


def _pnm_header_ex(data: bytes) -> tuple[int, int, int, int]:
    """P5/P6 header parse accepting any legal maxval → (w, h, maxval,
    pixel offset).  maxval > 255 means two-byte big-endian samples
    (Netpbm "plain raster" rule); decoders strip those to the high byte,
    matching cv2's 16U → 8U read (convertTo 1/256)."""
    tokens: list[bytes] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos:pos + 1] == b"#":
            while pos < len(data) and data[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PNM header")
        tokens.append(data[start:pos])
    pos += 1  # single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if not 0 < maxval < 65536:
        raise ValueError(f"unsupported PNM maxval {maxval}")
    if w <= 0 or h <= 0 or w > 1 << 20 or h > 1 << 20:
        raise ValueError("invalid PNM dimensions")
    return w, h, maxval, pos


def decode_page(media_ref: str) -> np.ndarray:
    """Fetch + decode one PAGE image: uint8 (h, w) (or (h, w, c) for color
    sources).  Format is dispatched by payload magic — PGM, PNG and baseline
    JPEG decode natively (stages.multimodal.decode_image), matching the
    reference's cv2.imdecode any-format behavior (utils/io_utils.py:42).
    The ONE page-decode helper for every pixel-consuming stage (decode,
    detect font-color sampling, mask refine, eval), so a new format lands in
    all of them at once.  Raises ValueError on unresolvable refs or
    undecodable payloads — callers degrade to poison-pill rows."""
    from ..stages.multimodal import decode_image

    try:
        return decode_image(fetch_media(media_ref))
    except NotImplementedError as e:    # unknown codec → poison-pill row
        raise ValueError(str(e)) from e


def fetch_media(media_ref: str) -> bytes:
    """Resolve a media_ref to encoded media bytes.

    Sandbox implementation synthesizes deterministic payloads (standing in
    for an object-store / Lance-blob fetch):

      page://…   binary-PGM page image (FIXTURES.md §2)
      jpg://…    the same rendered page, baseline-JPEG encoded (the
                 reference's example corpus format, data/examples/*.jpg)
      pjpg://…   the same page, PROGRESSIVE (SOF2) JPEG — real scanned-manga
                 corpora are heavily progressive
      bmp://…    the same page, uncompressed 8-bit BMP
      tif://…    the same page, baseline uncompressed TIFF
      gif://…    the same page, GIF89a (grayscale palette, LZW)
      vid://…    CTVF raw-frame video (synth_video)
      aud://…    RIFF/WAVE PCM16 audio (synth_wav)

    Refs that don't parse raise ValueError so the decode stage can emit an
    error row.
    """
    if media_ref.startswith("page://"):
        gt = page_ground_truth(media_ref)
        return encode_pgm(render_page(gt))
    if media_ref.startswith("jpg://"):
        from .jpeg import encode_baseline_jpeg

        gt = page_ground_truth("page://" + media_ref[len("jpg://"):])
        return encode_baseline_jpeg(render_page(gt), quality=92)
    if media_ref.startswith("pjpg://"):
        from .jpeg import encode_progressive_jpeg

        gt = page_ground_truth("page://" + media_ref[len("pjpg://"):])
        return encode_progressive_jpeg(render_page(gt), quality=92)
    if media_ref.startswith("bmp://"):
        from .bmp import encode_bmp

        gt = page_ground_truth("page://" + media_ref[len("bmp://"):])
        return encode_bmp(render_page(gt))
    if media_ref.startswith("tif://"):
        from .tiff import encode_tiff

        gt = page_ground_truth("page://" + media_ref[len("tif://"):])
        return encode_tiff(render_page(gt))
    if media_ref.startswith("gif://"):
        from .gif import encode_gif

        gt = page_ground_truth("page://" + media_ref[len("gif://"):])
        return encode_gif(render_page(gt))
    if media_ref.startswith("vid://"):
        return synth_video(media_ref)
    if media_ref.startswith("aud://"):
        return synth_wav(media_ref)
    raise ValueError(f"unresolvable media_ref: {media_ref!r}")


# ---------------------------------------------------------------------------
# Toy video container (CTVF) + PCM WAV — REAL encode/decode paths for the
# multimodal frame-sampling / audio-feature stages (no av/cv2 in-sandbox; a
# prod deployment swaps the codec, the Ray plumbing is identical).
# ---------------------------------------------------------------------------

_CTVF_MAGIC = b"CTVF"


def _ref_rng(tag: str, media_ref: str) -> np.random.Generator:
    import hashlib

    seed = int.from_bytes(
        hashlib.sha256(f"{tag}:{media_ref}".encode()).digest()[:8], "little")
    return np.random.default_rng(seed)


def encode_ctvf(frames: np.ndarray) -> bytes:
    """(n, h, w) uint8 → CTVF container: magic + uint16 n,h,w + raw frames."""
    import struct

    if frames.dtype != np.uint8 or frames.ndim != 3:
        raise ValueError("encode_ctvf expects uint8 (n, h, w)")
    n, h, w = frames.shape
    return _CTVF_MAGIC + struct.pack("<HHH", n, h, w) + frames.tobytes()


def decode_ctvf(data: bytes) -> np.ndarray:
    """CTVF bytes → (n, h, w) uint8.  ValueError on malformed input."""
    import struct

    if not data.startswith(_CTVF_MAGIC):
        raise ValueError("not a CTVF payload")
    n, h, w = struct.unpack("<HHH", data[4:10])
    pixels = np.frombuffer(data, dtype=np.uint8, count=n * h * w, offset=10)
    if pixels.size != n * h * w:
        raise ValueError("truncated CTVF frame data")
    return pixels.reshape(n, h, w).copy()


def synth_video(media_ref: str, n_frames: int = 24,
                h: int = 36, w: int = 64) -> bytes:
    """Deterministic toy clip: a bright blob translating across a noisy
    background — frame content varies smoothly with time so frame sampling
    has real structure to pick up."""
    rng = _ref_rng("vid", media_ref)
    base = rng.integers(0, 64, size=(h, w), dtype=np.uint8)
    ys, xs = np.mgrid[0:h, 0:w]
    frames = np.empty((n_frames, h, w), dtype=np.uint8)
    x0, y0 = rng.integers(0, w), rng.integers(0, h)
    vx, vy = int(rng.integers(1, 4)), int(rng.integers(1, 3))
    for t in range(n_frames):
        cx, cy = (x0 + vx * t) % w, (y0 + vy * t) % h
        blob = 191.0 * np.exp(-(((xs - cx) ** 2) + ((ys - cy) ** 2)) / 40.0)
        frames[t] = np.clip(base + blob, 0, 255).astype(np.uint8)
    return encode_ctvf(frames)


def synth_wav(media_ref: str, sr: int = 8000, seconds: float = 1.0) -> bytes:
    """Deterministic PCM16 mono WAV: a mixture of 3 seeded sine tones plus
    noise, written with the stdlib ``wave`` module (a real RIFF file any
    audio tool can read)."""
    import io
    import wave

    rng = _ref_rng("aud", media_ref)
    t = np.arange(int(sr * seconds)) / sr
    sig = np.zeros_like(t)
    for _ in range(3):
        f = float(rng.uniform(100, 2000))
        sig += float(rng.uniform(0.1, 0.4)) * np.sin(2 * np.pi * f * t)
    sig += 0.05 * rng.standard_normal(t.size)
    pcm = np.clip(sig, -1, 1) * 32767
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(pcm.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float64 mono samples in [-1, 1], sample_rate).
    stdlib ``wave`` parsing — a real decoder, ValueError on malformed."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(data), "rb") as wf:
            sr = wf.getframerate()
            nch = wf.getnchannels()
            width = wf.getsampwidth()
            raw = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError) as e:
        raise ValueError(f"not a WAV payload: {e}") from e
    if width != 2:
        raise ValueError(f"unsupported WAV sample width {width}")
    samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    if nch > 1:
        samples = samples.reshape(-1, nch).mean(axis=1)
    return samples, sr

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
    return header + img.tobytes()


def decode_pgm(data: bytes) -> np.ndarray:
    """Binary PGM (P5) → uint8 (h, w).  Raises ValueError on malformed input
    (callers turn this into an error row, never a crash — SURVEY.md §4
    poison-pill handling)."""
    if not data.startswith(b"P5"):
        raise ValueError("not a binary PGM (P5) payload")
    # Header = magic, width, height, maxval tokens; comments (#...) allowed.
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
            raise ValueError("truncated PGM header")
        tokens.append(data[start:pos])
    pos += 1  # single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"unsupported PGM maxval {maxval}")
    pixels = np.frombuffer(data, dtype=np.uint8, count=h * w, offset=pos)
    if pixels.size != h * w:
        raise ValueError("truncated PGM pixel data")
    return pixels.reshape(h, w).copy()


def fetch_media(media_ref: str) -> bytes:
    """Resolve a media_ref to encoded page bytes.

    Sandbox implementation synthesizes the deterministic page
    (FIXTURES.md §2); refs that don't parse raise ValueError so the decode
    stage can emit an error row.
    """
    if not media_ref.startswith("page://"):
        raise ValueError(f"unresolvable media_ref: {media_ref!r}")
    gt = page_ground_truth(media_ref)
    return encode_pgm(render_page(gt))

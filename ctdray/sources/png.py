"""Pure-python PNG codec (zlib + numpy) — no cv2/PIL needed.

The reference's primary image format is PNG: ``imread`` decodes it via
``cv2.imdecode`` and the mask sink writes ``mask-<name>.png``
(utils/io_utils.py:42-53, inference.py:70).  The sandbox has no cv2, but it
has ``zlib``, and PNG's layout (IHDR/IDAT chunks, per-scanline filters) is
fully decodable with numpy:

  decode: 8- and 16-bit greyscale / RGB / RGBA, sequential or Adam7; all
          five scanline filter types (None/Sub/Up/Average/Paeth).  16-bit
          samples are stripped to their high byte — the libpng
          ``png_set_strip_16`` behavior cv2's PNG decoder requests, so
          parity with ``cv2.imdecode`` holds for 16-bit scanner output.
  encode: filter 0 scanlines, one zlib IDAT — valid for any PNG reader

Malformed payloads raise ValueError so pipeline decode stages degrade to
error rows (SURVEY.md §4 poison-pill handling), never crash.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_COLOR_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}   # grey, rgb, grey+a, rgba


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        yield ctype, body
        pos += 12 + length          # length + type + body + crc
        if ctype == b"IEND":
            return


def probe_dims(data: bytes) -> tuple[int, int]:
    """Header-only (h, w) from IHDR, with the same depth/color/interlace
    support checks as :func:`decode_png` — no IDAT decompression."""
    if not data.startswith(_SIG):
        raise ValueError("not a PNG payload")
    if len(data) < 29 or data[12:16] != b"IHDR":
        raise ValueError("PNG missing IHDR")
    width, height, depth, color, _comp, _filt, interlace = \
        struct.unpack(">IIBBBBB", data[16:29])
    if depth not in (8, 16):
        raise ValueError(f"unsupported PNG bit depth {depth}")
    if color not in _COLOR_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color}")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace {interlace}")
    if width <= 0 or height <= 0 or width > 1 << 20 or height > 1 << 20:
        raise ValueError("invalid PNG dimensions")
    return height, width


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 (h, w) or (h, w, c)."""
    if not data.startswith(_SIG):
        raise ValueError("not a PNG payload")
    width = height = None
    channels = 0
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth not in (8, 16):
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if color not in _COLOR_CHANNELS:
                raise ValueError(f"unsupported PNG color type {color}")
            if interlace not in (0, 1):
                raise ValueError(f"unknown PNG interlace {interlace}")
            adam7 = interlace == 1
            channels = _COLOR_CHANNELS[color]
            bps = depth // 8                  # bytes per sample
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if adam7:
        return _decode_adam7(raw, width, height, channels, bps)
    bpp = channels * bps
    stride = width * bpp
    if raw.size != height * (stride + 1):
        raise ValueError("PNG scanline data size mismatch")
    img = _unfilter(raw.reshape(height, stride + 1), width, height,
                    bpp).astype(np.uint8).reshape(height, width,
                                                  channels, bps)
    img = img[:, :, :, 0]                     # 16-bit: MSB first (strip_16)
    return img[:, :, 0] if channels == 1 else img


_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _decode_adam7(raw: np.ndarray, width: int, height: int,
                  channels: int, bps: int = 1) -> np.ndarray:
    """Adam7-interlaced scanline stream → image: each of the 7 passes is a
    filtered sub-image in its own right (per-pass scanlines and filter
    bytes), unfiltered independently then scattered onto its grid."""
    out = np.zeros((height, width, channels), dtype=np.uint8)
    bpp = channels * bps
    pos = 0
    for (x0, y0, dx, dy) in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        pstride = pw * bpp
        need = ph * (pstride + 1)
        if pos + need > raw.size:
            raise ValueError("PNG interlaced scanline data short")
        sub = _unfilter(raw[pos:pos + need].reshape(ph, pstride + 1),
                        pw, ph, bpp)
        pos += need
        out[y0::dy, x0::dx] = sub.astype(np.uint8).reshape(
            ph, pw, channels, bps)[:, :, :, 0]
    if pos != raw.size:
        raise ValueError("PNG scanline data size mismatch")
    return out[:, :, 0] if channels == 1 else out


def _unfilter(raw: np.ndarray, width: int, height: int,
              bpp: int) -> np.ndarray:
    """(h, stride+1) filtered scanlines → (h, stride) int32 BYTE rows
    (the five PNG filters; shared by the sequential and Adam7 paths).
    ``bpp`` is bytes per pixel — filters operate on bytes regardless of
    sample depth (PNG spec §6.2), so 16-bit rows just use bpp = 2c."""
    stride = width * bpp
    filters, lines = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros((height, stride), dtype=np.int32)
    for y in range(height):
        f, cur = int(filters[y]), lines[y].copy()
        prior = out[y - 1] if y else np.zeros(stride, dtype=np.int32)
        if f == 0:
            out[y] = cur
        elif f == 1:                 # Sub: left — mod-256 prefix sum per channel
            out[y] = (np.cumsum(cur.reshape(width, bpp), axis=0,
                                dtype=np.int64) & 0xFF).reshape(stride)
        elif f == 2:                 # Up
            out[y] = (cur + prior) & 0xFF
        elif f == 3:                 # Average
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prior[x]) >> 1)) & 0xFF
            out[y] = cur
        elif f == 4:                 # Paeth
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prior[x]
                c = prior[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else \
                    (b if pb_ <= pc_ else c)
                cur[x] = (cur[x] + pred) & 0xFF
            out[y] = cur
        else:
            raise ValueError(f"unknown PNG filter {f}")
    return out


def encode_png(img: np.ndarray) -> bytes:
    """uint8 (h, w) or (h, w, 3|4) → PNG bytes (filter 0, zlib level 6)."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("encode_png expects uint8 (h,w[,c])")
    if img.ndim == 2:
        color, arr = 0, img[:, :, None]
    elif img.shape[2] == 3:
        color, arr = 2, img
    elif img.shape[2] == 4:
        color, arr = 6, img
    else:
        raise ValueError(f"unsupported channel count {img.shape[2]}")
    h, w, c = arr.shape
    scan = np.zeros((h, w * c + 1), dtype=np.uint8)
    scan[:, 1:] = arr.reshape(h, w * c)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body)) + ctype + body + \
            struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)

    return (_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scan.tobytes(), 6))
            + chunk(b"IEND", b""))

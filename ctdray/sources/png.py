"""Pure-python PNG codec (zlib + numpy) — no cv2/PIL.

The reference's primary image format is PNG: ``imread`` decodes it via
``cv2.imdecode`` and the mask sink writes ``mask-<name>.png``
(utils/io_utils.py:42-53, inference.py:70).  The sandbox has no cv2, but it
has ``zlib``, and PNG's layout (IHDR/IDAT chunks, per-scanline filters) is
fully decodable with numpy:

  decode: every depth/color class cv2 takes — 8- and 16-bit greyscale /
          RGB / RGBA, 1/2/4-bit greyscale (expanded to 8-bit by bit
          replication, libpng ``expand_gray_1_2_4``), and paletted
          (color type 3) at 1/2/4/8-bit indices (palette → BGR, or (h, w)
          when the palette is grayscale — the GIF convention); sequential
          or Adam7; all five scanline filter types.  16-bit samples strip
          to their high byte (libpng ``strip_16``, which cv2 requests).
  encode: filter 0 scanlines, one zlib IDAT — valid for any PNG reader

Malformed payloads raise ValueError so pipeline decode stages degrade to
error rows (SURVEY.md §4 poison-pill handling), never crash.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# channels of the stored sample plane; palette (3) stores 1 index/pixel
_COLOR_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_ALLOWED_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                   4: (8, 16), 6: (8, 16)}
_GRAY_SCALE = {1: 255, 2: 85, 4: 17}     # bit-replication expand factors


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


def _validate_ihdr(depth: int, color: int, interlace: int) -> None:
    if color not in _COLOR_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color}")
    if depth not in _ALLOWED_DEPTHS[color]:
        raise ValueError(
            f"unsupported PNG bit depth {depth} for color type {color}")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace {interlace}")


def probe_dims(data: bytes) -> tuple[int, int]:
    """Header-only (h, w) from IHDR, with the same depth/color/interlace
    support checks as :func:`decode_png` — no IDAT decompression."""
    if not data.startswith(_SIG):
        raise ValueError("not a PNG payload")
    if len(data) < 29 or data[12:16] != b"IHDR":
        raise ValueError("PNG missing IHDR")
    width, height, depth, color, _comp, _filt, interlace = \
        struct.unpack(">IIBBBBB", data[16:29])
    _validate_ihdr(depth, color, interlace)
    if width <= 0 or height <= 0 or width > 1 << 20 or height > 1 << 20:
        raise ValueError("invalid PNG dimensions")
    return height, width


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 (h, w) or (h, w, c)."""
    if not data.startswith(_SIG):
        raise ValueError("not a PNG payload")
    width = height = None
    channels = 0
    plte = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            _validate_ihdr(depth, color, interlace)
            adam7 = interlace == 1
            channels = _COLOR_CHANNELS[color]
        elif ctype == b"PLTE":
            if len(body) % 3 or not body:
                raise ValueError("invalid PNG PLTE chunk")
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if width <= 0 or height <= 0 or width > 1 << 20 or height > 1 << 20:
        raise ValueError("invalid PNG dimensions")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    # sample plane (h, w, channels) uint8: 16-bit stripped to the MSB,
    # sub-8-bit unpacked to one RAW sample value per entry
    if adam7:
        plane = _decode_adam7(raw, width, height, channels, depth)
    else:
        plane = _scanlines_to_plane(raw, width, height, channels, depth)
    if color == 3:
        if plte is None:
            raise ValueError("paletted PNG missing PLTE")
        idx = plane[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        gray = bool((plte[:, 0] == plte[:, 1]).all()
                    and (plte[:, 1] == plte[:, 2]).all())
        if gray:
            return plte[:, 0][idx]
        return plte[idx][:, :, ::-1]             # RGB → BGR
    if color == 0 and depth < 8:
        return plane[:, :, 0] * np.uint8(_GRAY_SCALE[depth])
    return plane[:, :, 0] if channels == 1 else plane


def _scanlines_to_plane(raw: np.ndarray, width: int, height: int,
                        channels: int, depth: int) -> np.ndarray:
    """Filtered scanline bytes → (h, w, channels) uint8 sample plane."""
    bpp = max(1, channels * depth // 8)
    stride = (width * channels * depth + 7) // 8
    if raw.size != height * (stride + 1):
        raise ValueError("PNG scanline data size mismatch")
    rows = _unfilter(raw.reshape(height, stride + 1), bpp) \
        .astype(np.uint8)
    if depth >= 8:
        bps = depth // 8
        return rows.reshape(height, width, channels, bps)[:, :, :, 0]
    return _unpack_samples(rows, width * channels, depth) \
        .reshape(height, width, channels)


def _unpack_samples(rows: np.ndarray, n_samples: int,
                    depth: int) -> np.ndarray:
    """(h, stride_bytes) uint8 → (h, n_samples) raw sample values for
    depth 1/2/4 (MSB-first packing, PNG spec §7.2)."""
    h = rows.shape[0]
    bits = np.unpackbits(rows, axis=1)
    if bits.shape[1] < n_samples * depth:
        raise ValueError("PNG packed scanline short")
    bits = bits[:, :n_samples * depth].reshape(h, n_samples, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (bits * weights).sum(axis=2).astype(np.uint8)


_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _decode_adam7(raw: np.ndarray, width: int, height: int,
                  channels: int, depth: int) -> np.ndarray:
    """Adam7-interlaced scanline stream → (h, w, channels) sample plane:
    each of the 7 passes is a filtered sub-image in its own right
    (per-pass scanlines, strides and filter bytes), converted
    independently then scattered onto its grid."""
    out = np.zeros((height, width, channels), dtype=np.uint8)
    pos = 0
    for (x0, y0, dx, dy) in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        pstride = (pw * channels * depth + 7) // 8
        need = ph * (pstride + 1)
        if pos + need > raw.size:
            raise ValueError("PNG interlaced scanline data short")
        out[y0::dy, x0::dx] = _scanlines_to_plane(
            raw[pos:pos + need], pw, ph, channels, depth)
        pos += need
    if pos != raw.size:
        raise ValueError("PNG scanline data size mismatch")
    return out


def _unfilter(raw: np.ndarray, bpp: int) -> np.ndarray:
    """(h, stride+1) filtered scanlines → (h, stride) int32 BYTE rows
    (the five PNG filters; shared by the sequential and Adam7 paths).
    ``bpp`` is bytes per pixel — filters operate on bytes regardless of
    sample depth (PNG spec §6.2): 2c for 16-bit rows, 1 for sub-byte."""
    height, stride = raw.shape[0], raw.shape[1] - 1
    filters, lines = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros((height, stride), dtype=np.int32)
    for y in range(height):
        f, cur = int(filters[y]), lines[y].copy()
        prior = out[y - 1] if y else np.zeros(stride, dtype=np.int32)
        if f == 0:
            out[y] = cur
        elif f == 1:                 # Sub: left — mod-256 prefix sum per channel
            out[y] = (np.cumsum(cur.reshape(-1, bpp), axis=0,
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

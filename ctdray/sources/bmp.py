"""Pure-numpy BMP (Windows bitmap) codec — uncompressed 8-bit grayscale
(palette), 24-bit BGR and BI_RLE8-compressed 8-bit, the classic
BITMAPINFOHEADER layout.

The reference decodes whatever cv2.imdecode accepts (utils/io_utils.py:42);
BMP is the remaining common raster format after PGM/PNG/JPEG that needs no
entropy coder: rows are raw pixels padded to 4-byte boundaries, stored
bottom-up by default (positive height).  Encode writes bottom-up 24-bit BGR
(or 8-bit + a grayscale palette); decode additionally accepts the top-down
(negative height) variant and 32-bit BI_RGB rows.  Malformed payloads raise
``ValueError`` so the media layer's poison-pill contract applies
(ctdray.sources.media.decode_page).
"""
from __future__ import annotations

import struct

import numpy as np

_FILE_HDR = struct.Struct("<2sIHHI")      # magic, file size, res, res, offset
_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER


def encode_bmp(img: np.ndarray) -> bytes:
    """uint8 (h, w) grayscale → 8-bit palette BMP; (h, w, 3) BGR → 24-bit
    BMP.  Bottom-up rows, 4-byte padded — the layout every decoder accepts."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("encode_bmp expects uint8 (h, w) or (h, w, 3)")
    h, w = img.shape[:2]
    if img.ndim == 2:
        bpp, palette_n = 8, 256
        rows = img
    else:
        if img.shape[2] != 3:
            raise ValueError("encode_bmp expects 3 channels for color")
        bpp, palette_n = 24, 0
        rows = img
    stride = (w * bpp // 8 + 3) & ~3
    palette = b""
    if palette_n:
        g = np.arange(256, dtype=np.uint8)
        palette = np.stack([g, g, g, np.zeros(256, np.uint8)], 1).tobytes()
    data_off = _FILE_HDR.size + _INFO_HDR.size + len(palette)
    # bottom-up: last image row first; pad each row to the stride
    buf = np.zeros((h, stride), dtype=np.uint8)
    flat = rows[::-1].reshape(h, -1)
    buf[:, : flat.shape[1]] = flat
    pixel_bytes = buf.tobytes()
    file_size = data_off + len(pixel_bytes)
    return (_FILE_HDR.pack(b"BM", file_size, 0, 0, data_off)
            + _INFO_HDR.pack(_INFO_HDR.size, w, h, 1, bpp, 0,
                             len(pixel_bytes), 2835, 2835, palette_n, 0)
            + palette + pixel_bytes)


def probe_dims(data: bytes) -> tuple[int, int]:
    """Header-only (h, w) with :func:`decode_bmp`'s header-level support
    checks (planes/compression/bit depth) — no pixel reads."""
    if data[:2] != b"BM" or len(data) < _FILE_HDR.size + _INFO_HDR.size:
        raise ValueError("not a BMP payload")
    (hdr_size, w, h, planes, bpp, compression, _img_size,
     _, _, _clr_used, _) = _INFO_HDR.unpack_from(data, _FILE_HDR.size)
    if hdr_size < _INFO_HDR.size or planes != 1:
        raise ValueError("unsupported BMP header")
    if compression not in (0, 1):
        raise ValueError(f"unsupported BMP compression {compression}")
    if compression == 1 and bpp != 8:
        raise ValueError("BMP RLE8 requires 8-bit pixels")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    h = abs(h)
    if w <= 0 or h == 0 or w > 1 << 20 or h > 1 << 20:
        raise ValueError("invalid BMP dimensions")
    return h, w


def _decode_rle8(data: bytes, pos: int, w: int, h: int) -> np.ndarray:
    """BI_RLE8 stream → (h, stride) bottom-up index rows (MSDN semantics:
    encoded (count, value) runs; escapes 0=end-of-line, 1=end-of-bitmap,
    2=delta(dx, dy), n>=3=absolute mode with word-aligned literals)."""
    stride = (w + 3) & ~3
    out = np.zeros((h, stride), dtype=np.uint8)
    x = y = 0
    n = len(data)
    while True:
        if pos + 2 > n:
            raise ValueError("truncated BMP RLE8 stream")
        cnt, val = data[pos], data[pos + 1]
        pos += 2
        if cnt:                                    # encoded run
            if y >= h or x + cnt > stride:
                raise ValueError("BMP RLE8 run out of bounds")
            out[y, x:x + cnt] = val
            x += cnt
            continue
        if val == 0:                               # end of line
            x, y = 0, y + 1
            continue
        if val == 1:                               # end of bitmap
            return out[::-1]
        if val == 2:                               # delta jump
            if pos + 2 > n:
                raise ValueError("truncated BMP RLE8 delta")
            x += data[pos]
            y += data[pos + 1]
            pos += 2
            if x > stride or y > h:
                raise ValueError("BMP RLE8 delta out of bounds")
            continue
        # absolute mode: val literal bytes, padded to a word boundary
        end = pos + val
        if end > n or y >= h or x + val > stride:
            raise ValueError("BMP RLE8 absolute run out of bounds")
        out[y, x:x + val] = np.frombuffer(data, np.uint8, count=val,
                                          offset=pos)
        x += val
        pos = end + (val & 1)


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → uint8 (h, w) for 8-bit grayscale-palette images, else
    (h, w, 3) BGR.  Accepts 8/24/32-bit uncompressed (BI_RGB) payloads and
    8-bit BI_RLE8, bottom-up or top-down."""
    if data[:2] != b"BM" or len(data) < _FILE_HDR.size + _INFO_HDR.size:
        raise ValueError("not a BMP payload")
    _, _, _, _, data_off = _FILE_HDR.unpack_from(data, 0)
    (hdr_size, w, h, planes, bpp, compression, _img_size,
     _, _, clr_used, _) = _INFO_HDR.unpack_from(data, _FILE_HDR.size)
    if hdr_size < _INFO_HDR.size or planes != 1:
        raise ValueError("unsupported BMP header")
    if compression not in (0, 1):
        raise ValueError(f"unsupported BMP compression {compression}")
    if compression == 1 and bpp != 8:
        raise ValueError("BMP RLE8 requires 8-bit pixels")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0 or w > 1 << 20 or h > 1 << 20:
        raise ValueError("invalid BMP dimensions")
    if compression == 1:
        if top_down:                  # spec: RLE bitmaps cannot be top-down
            raise ValueError("top-down BMP cannot be RLE-compressed")
        raw = _decode_rle8(data, data_off, w, h)
    else:
        stride = (w * bpp // 8 + 3) & ~3
        need = data_off + stride * h
        if len(data) < need:
            raise ValueError("truncated BMP pixel data")
        raw = np.frombuffer(data, np.uint8, count=stride * h,
                            offset=data_off).reshape(h, stride)
        if not top_down:
            raw = raw[::-1]
    if bpp == 8:
        idx = raw[:, :w]
        # palette: 4 bytes/entry BGRX after the headers
        pal_off = _FILE_HDR.size + hdr_size
        n_pal = clr_used or 256
        pal = np.frombuffer(data, np.uint8, count=n_pal * 4,
                            offset=pal_off).reshape(n_pal, 4)
        if bool((pal[:, 0] == pal[:, 1]).all() and (pal[:, 1] == pal[:, 2]).all()):
            # grayscale palette → map through it and return 2-D
            return pal[:, 0][idx].copy()
        return pal[idx][:, :, :3].copy()           # BGR per palette entry
    n_ch = bpp // 8
    px = raw[:, : w * n_ch].reshape(h, w, n_ch)
    return px[:, :, :3].copy()                     # drop alpha for 32-bit

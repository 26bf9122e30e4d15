"""16-bit PNG decode (ctdray.sources.png): high-byte strip parity with
cv2/libpng ``png_set_strip_16``, all five scanline filters at bpp=2c,
Adam7 interlace, and the poison-pill contract for sub-8-bit depths."""
import struct
import zlib

import numpy as np
import pytest

from ctdray.sources.png import _ADAM7, _SIG, decode_png
from ctdray.stages.multimodal import decode_image


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body)) + ctype + body + \
        struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def _filter_rows(rows: np.ndarray, bpp: int, filters) -> bytes:
    """Apply the spec's per-row byte filters (the encode direction) so the
    decoder's unfilter path is exercised against an independent oracle."""
    h, stride = rows.shape
    out = bytearray()
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = rows[y].astype(np.int32)
        f = filters[y % len(filters)]
        out.append(f)
        if f == 0:
            enc = cur
        elif f == 1:
            left = np.concatenate((np.zeros(bpp, np.int32), cur[:-bpp]))
            enc = (cur - left) & 0xFF
        elif f == 2:
            enc = (cur - prior) & 0xFF
        elif f == 3:
            enc = np.empty(stride, np.int32)
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                enc[x] = (cur[x] - ((left + prior[x]) >> 1)) & 0xFF
        else:
            enc = np.empty(stride, np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prior[x]
                c = prior[x - bpp] if x >= bpp else 0
                enc[x] = (cur[x] - _paeth(a, b, c)) & 0xFF
        out.extend(enc.astype(np.uint8).tobytes())
        prior = cur
    return bytes(out)


def _png16(arr16: np.ndarray, filters=(0,), interlace: int = 0) -> bytes:
    """uint16 (h, w[, c]) big-endian-sample PNG at depth 16."""
    arr = arr16[:, :, None] if arr16.ndim == 2 else arr16
    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = np.frombuffer(arr.astype(">u2").tobytes(), np.uint8) \
        .reshape(h, w * c * 2)
    if interlace == 0:
        scan = _filter_rows(raw, c * 2, filters)
    else:
        parts = []
        for (x0, y0, dx, dy) in _ADAM7:
            sub = arr[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            ph, pw = sub.shape[:2]
            sraw = np.frombuffer(sub.astype(">u2").tobytes(), np.uint8) \
                .reshape(ph, pw * c * 2)
            parts.append(_filter_rows(sraw, c * 2, filters))
        scan = b"".join(parts)
    ihdr = struct.pack(">IIBBBBB", w, h, 16, color, 0, 0, interlace)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(scan, 6))
            + _chunk(b"IEND", b""))


def test_png16_gray_all_filters_strips_to_high_byte():
    rng = np.random.default_rng(21)
    arr = rng.integers(0, 1 << 16, size=(13, 9), dtype=np.uint16)
    for filters in ((0,), (1,), (2,), (3,), (4,), (0, 1, 2, 3, 4)):
        out = decode_png(_png16(arr, filters))
        assert out.dtype == np.uint8 and out.shape == arr.shape
        np.testing.assert_array_equal(out, (arr >> 8).astype(np.uint8))


def test_png16_rgb_rgba_graya():
    rng = np.random.default_rng(22)
    for c in (2, 3, 4):
        arr = rng.integers(0, 1 << 16, size=(7, 11, c), dtype=np.uint16)
        out = decode_png(_png16(arr, (0, 4, 1)))
        assert out.shape == arr.shape
        np.testing.assert_array_equal(out, (arr >> 8).astype(np.uint8))


def test_png16_adam7_interlaced():
    rng = np.random.default_rng(23)
    arr = rng.integers(0, 1 << 16, size=(18, 13), dtype=np.uint16)
    out = decode_png(_png16(arr, (0, 2, 1, 4, 3), interlace=1))
    np.testing.assert_array_equal(out, (arr >> 8).astype(np.uint8))
    rgb = rng.integers(0, 1 << 16, size=(9, 6, 3), dtype=np.uint16)
    out = decode_png(_png16(rgb, (4,), interlace=1))
    np.testing.assert_array_equal(out, (rgb >> 8).astype(np.uint8))


def test_png16_via_decode_image_and_low_depths_still_poisoned():
    arr = (np.arange(35, dtype=np.uint16).reshape(5, 7) * 1800)
    np.testing.assert_array_equal(decode_image(_png16(arr)),
                                  (arr >> 8).astype(np.uint8))
    # invalid depths still poison-pill (and 1/2/4-bit headers over a
    # 16-bit body fail the scanline size check), never a crash
    data = bytearray(_png16(arr))
    ihdr_off = len(_SIG) + 8
    for depth in (0, 3, 7, 32):
        bad = bytearray(data)
        bad[ihdr_off + 8] = depth
        with pytest.raises(ValueError):
            decode_png(bytes(bad))
    for depth in (1, 2, 4):          # valid header, wrong-sized body
        bad = bytearray(data)
        bad[ihdr_off + 8] = depth
        with pytest.raises(ValueError):
            decode_png(bytes(bad))

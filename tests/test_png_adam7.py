"""Adam7-interlaced PNG decode (ctdray.sources.png)."""
import struct
import zlib

import numpy as np
import pytest

from ctdray.sources.png import decode_png

_GRIDS = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _adam7_png(img: np.ndarray) -> bytes:
    """Hand-assembled interlaced PNG: each of the 7 passes is a filtered
    sub-image; pass 4's odd rows use the Sub filter so per-pass unfiltering
    is exercised, the rest are filter 0."""
    arr = img[:, :, None] if img.ndim == 2 else img
    h, w, c = arr.shape
    color = 0 if c == 1 else (2 if c == 3 else 6)
    passes = []
    for pi, (x0, y0, dx, dy) in enumerate(_GRIDS):
        sub = arr[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        ph, pw = sub.shape[:2]
        rows = sub.reshape(ph, pw * c)
        filt = bytearray()
        for r in range(ph):
            if pi == 3 and r % 2:
                row = rows[r].astype(np.int16)
                d = row.copy()
                d[c:] = (row[c:] - row[:-c]) % 256
                filt += b"\x01" + bytes(d.astype(np.uint8))
            else:
                filt += b"\x00" + bytes(rows[r])
        passes.append(bytes(filt))
    idat = zlib.compress(b"".join(passes))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 1)

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + \
            struct.pack(">I", zlib.crc32(t + b))

    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", idat) + chunk(b"IEND", b""))


def test_adam7_decodes_exactly():
    rng = np.random.default_rng(13)
    for shape in ((1, 1), (8, 8), (13, 21), (21, 13, 3), (7, 3)):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = decode_png(_adam7_png(img))
        assert out.shape == img.shape
        np.testing.assert_array_equal(out, img)


def test_adam7_truncated_raises():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    good = _adam7_png(img)
    # cut IDAT short: rebuild with truncated compressed payload
    bad = _adam7_png(img)[: len(good) // 2]
    with pytest.raises(ValueError):
        decode_png(bad)


def test_adam7_via_decode_image():
    from ctdray.stages.multimodal import decode_image

    img = np.arange(6 * 9, dtype=np.uint8).reshape(6, 9)
    np.testing.assert_array_equal(decode_image(_adam7_png(img)), img)

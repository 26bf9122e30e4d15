"""Paletted (color type 3) and 1/2/4-bit grayscale PNG decode: palette →
BGR (grayscale palettes return (h, w), the GIF convention), sub-8 gray
expands by bit replication (libpng expand_gray_1_2_4), filters operate on
packed bytes (bpp=1), sequential and Adam7."""
import struct
import zlib

import numpy as np
import pytest

from ctdray.sources.png import _ADAM7, _SIG, decode_png
from ctdray.stages.multimodal import decode_image, probe_image_dims
from tests.test_png16 import _chunk, _filter_rows

_GRAY_SCALE = {1: 255, 2: 85, 4: 17}


def _pack_rows(samples: np.ndarray, depth: int) -> np.ndarray:
    """(h, w) sample values → (h, stride) MSB-first packed bytes."""
    h, w = samples.shape
    if depth == 8:
        return samples.astype(np.uint8)
    bits = ((samples[:, :, None].astype(np.uint8)
             >> np.arange(depth - 1, -1, -1)) & 1).reshape(h, w * depth)
    pad = (-bits.shape[1]) % 8
    if pad:
        bits = np.pad(bits, ((0, 0), (0, pad)))
    return np.packbits(bits, axis=1)


def _png_lowdepth(samples: np.ndarray, depth: int, color: int,
                  palette: np.ndarray | None = None,
                  filters=(0,), interlace: int = 0) -> bytes:
    """(h, w) raw samples (gray values or palette indices) → PNG bytes."""
    h, w = samples.shape
    if interlace == 0:
        scan = _filter_rows(_pack_rows(samples, depth), 1, filters)
    else:
        parts = []
        for (x0, y0, dx, dy) in _ADAM7:
            sub = samples[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            parts.append(_filter_rows(_pack_rows(sub, depth), 1, filters))
        scan = b"".join(parts)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    out = _SIG + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    return out + _chunk(b"IDAT", zlib.compress(scan, 6)) + _chunk(b"IEND", b"")


def test_gray_1_2_4_bit_expands_by_bit_replication():
    rng = np.random.default_rng(41)
    for depth in (1, 2, 4):
        arr = rng.integers(0, 1 << depth, size=(13, 11), dtype=np.uint8)
        for filters in ((0,), (1, 2), (4, 3, 0)):
            out = decode_png(_png_lowdepth(arr, depth, 0, filters=filters))
            assert out.shape == arr.shape and out.dtype == np.uint8
            np.testing.assert_array_equal(out, arr * _GRAY_SCALE[depth])


def test_palette_color_returns_bgr():
    rng = np.random.default_rng(42)
    for depth in (1, 2, 4, 8):
        n = 1 << depth
        pal = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
        pal[0] = (10, 200, 30)                   # guarantee non-gray
        idx = rng.integers(0, n, size=(9, 14), dtype=np.uint8)
        out = decode_png(_png_lowdepth(idx, depth, 3, palette=pal,
                                       filters=(0, 2)))
        assert out.shape == (9, 14, 3)
        np.testing.assert_array_equal(out, pal[idx][:, :, ::-1])


def test_gray_palette_returns_2d():
    g = np.arange(16, dtype=np.uint8) * 17
    pal = np.stack([g, g, g], axis=1)
    idx = (np.arange(48, dtype=np.uint8) % 16).reshape(6, 8)
    out = decode_png(_png_lowdepth(idx, 4, 3, palette=pal))
    assert out.shape == (6, 8)
    np.testing.assert_array_equal(out, pal[:, 0][idx])


def test_lowdepth_adam7_and_dispatch():
    rng = np.random.default_rng(43)
    arr = rng.integers(0, 4, size=(19, 12), dtype=np.uint8)
    data = _png_lowdepth(arr, 2, 0, filters=(0, 1, 2), interlace=1)
    np.testing.assert_array_equal(decode_image(data), arr * 85)
    assert probe_image_dims(data) == (19, 12)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    pal[1] = (1, 2, 3)
    idx = rng.integers(0, 16, size=(10, 7), dtype=np.uint8)
    data = _png_lowdepth(idx, 4, 3, palette=pal, filters=(4,), interlace=1)
    np.testing.assert_array_equal(decode_png(data), pal[idx][:, :, ::-1])


def test_palette_poison_pills():
    idx = np.zeros((4, 4), np.uint8)
    pal = np.zeros((2, 3), np.uint8)
    # missing PLTE
    with pytest.raises(ValueError):
        decode_png(_png_lowdepth(idx, 1, 3, palette=None))
    # index out of palette range
    bad_idx = np.full((4, 4), 3, np.uint8)
    with pytest.raises(ValueError):
        decode_png(_png_lowdepth(bad_idx, 2, 3, palette=pal))
    # 16-bit palette indices are illegal per spec
    with pytest.raises(ValueError):
        probe_image_dims(
            _SIG + _chunk(b"IHDR",
                          struct.pack(">IIBBBBB", 4, 4, 16, 3, 0, 0, 0)))

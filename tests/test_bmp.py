"""BMP codec (ctdray.sources.bmp) — round trips, layout variants, and the
poison-pill contract through the media layer."""
import numpy as np
import pytest

from ctdray.sources.bmp import decode_bmp, encode_bmp


def test_gray_roundtrip_exact():
    rng = np.random.default_rng(1)
    for shape in ((1, 1), (7, 5), (64, 63), (33, 101)):  # odd widths → padding
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = decode_bmp(encode_bmp(img))
        assert out.shape == img.shape and out.dtype == np.uint8
        np.testing.assert_array_equal(out, img)


def test_color_roundtrip_exact():
    rng = np.random.default_rng(2)
    for shape in ((5, 3, 3), (40, 41, 3)):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = decode_bmp(encode_bmp(img))
        np.testing.assert_array_equal(out, img)


def test_topdown_and_32bit_variants():
    import struct

    img = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    data = bytearray(encode_bmp(img))
    # flip height negative → top-down; rows must then be stored first-first
    h = struct.unpack_from("<i", data, 14 + 8)[0]
    struct.pack_into("<i", data, 14 + 8, -h)
    # re-order the pixel rows to top-down to keep the image identical
    off = struct.unpack_from("<I", data, 10)[0]
    stride = (4 * 3 + 3) & ~3
    rows = [bytes(data[off + i * stride: off + (i + 1) * stride])
            for i in range(2)]
    data[off:] = b"".join(rows[::-1])
    np.testing.assert_array_equal(decode_bmp(bytes(data)), img)

    # 32-bit BI_RGB: alpha byte dropped
    px = np.dstack([img, np.full(img.shape[:2], 7, np.uint8)])
    hdrF = struct.pack("<2sIHHI", b"BM", 0, 0, 0, 54)
    hdrI = struct.pack("<IiiHHIIiiII", 40, 4, 2, 1, 32, 0, 0, 0, 0, 0, 0)
    body = px[::-1].tobytes()
    np.testing.assert_array_equal(decode_bmp(hdrF + hdrI + body), img)


def test_malformed_raises_valueerror():
    img = np.zeros((4, 4), np.uint8)
    good = encode_bmp(img)
    for bad in (b"", b"BM", good[:30], good[:-3],
                b"XX" + good[2:],
                good[:30] + b"\xff\xff" + good[32:]):   # wild bpp
        with pytest.raises(ValueError):
            decode_bmp(bad)


def test_bmp_media_ref_decodes_and_detects():
    from ctdray.config import DetectorConfig
    from ctdray.detect_core import detect_page, page_line_spans
    from ctdray.sources.media import decode_page
    from ctdray.surrogate import SurrogateDetector

    ref_pgm = "page://doc-00000042/1"
    ref_bmp = "bmp://doc-00000042/1"
    a = decode_page(ref_pgm)
    b = decode_page(ref_bmp)
    np.testing.assert_array_equal(a, b)      # lossless: same rendered page
    cfg = DetectorConfig()
    det = SurrogateDetector(cfg)
    blocks_a, _ = detect_page(det, ref_pgm, *a.shape[:2], cfg)
    # NOTE: the surrogate derives tensors from the page:// ground truth, so
    # spans depend only on the underlying page identity, not the codec.
    blocks_b, _ = detect_page(det, ref_bmp.replace("bmp://", "page://"),
                              *b.shape[:2], cfg)
    assert page_line_spans(blocks_a) == page_line_spans(blocks_b)

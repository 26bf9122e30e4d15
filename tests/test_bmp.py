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


def _rle8_bmp(img: np.ndarray, use_delta: bool = False) -> bytes:
    """Hand-built BI_RLE8 BMP (grayscale palette): encoded runs + absolute
    literals + EOL/EOB escapes, optionally a delta jump over zeros."""
    import struct

    h, w = img.shape
    stream = bytearray()
    for y in range(h - 1, -1, -1):                 # bottom-up row order
        row = img[y]
        x = 0
        if use_delta and y == h - 1 and w > 4 and (row[:2] == 0).all():
            stream += bytes([0, 2, 2, 0])          # delta: skip 2 zeros
            x = 2
        while x < w:
            run = 1
            while x + run < w and row[x + run] == row[x] and run < 255:
                run += 1
            if run >= 3 or row[x] == row[min(x + 1, w - 1)]:
                stream += bytes([run, int(row[x])])
                x += run
            else:                                  # absolute literal chunk
                lit = min(w - x, 255)
                if lit < 3:
                    for k in range(lit):
                        stream += bytes([1, int(row[x + k])])
                    x += lit
                    continue
                stream += bytes([0, lit]) + bytes(int(v) for v in row[x:x + lit])
                if lit & 1:
                    stream += b"\x00"
                x += lit
        stream += bytes([0, 0])                    # end of line
    stream += bytes([0, 1])                        # end of bitmap
    g = np.arange(256, dtype=np.uint8)
    palette = np.stack([g, g, g, np.zeros(256, np.uint8)], 1).tobytes()
    data_off = 14 + 40 + len(palette)
    hdr = struct.pack("<2sIHHI", b"BM", data_off + len(stream), 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(stream),
                       2835, 2835, 256, 0)
    return hdr + info + palette + bytes(stream)


def test_rle8_roundtrip_runs_and_literals():
    rng = np.random.default_rng(51)
    # runs-heavy content (mask-like) and noisy content (absolute mode)
    runs = np.repeat(rng.integers(0, 5, size=(9, 8), dtype=np.uint8) * 60,
                     4, axis=1)
    noise = rng.integers(0, 256, size=(7, 13), dtype=np.uint8)
    for img in (runs, noise):
        out = decode_bmp(_rle8_bmp(img))
        assert out.shape == img.shape
        np.testing.assert_array_equal(out, img)


def test_rle8_delta_skips_as_zero():
    img = np.zeros((6, 10), np.uint8)
    img[:, 3:] = 77
    np.testing.assert_array_equal(decode_bmp(_rle8_bmp(img, use_delta=True)),
                                  img)


def test_rle8_poison_pills():
    import struct

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    good = _rle8_bmp(img)
    from ctdray.stages.multimodal import probe_image_dims
    assert probe_image_dims(good) == (8, 8)
    # truncations must raise, never hang or crash
    for cut in range(len(good) - 40, len(good) - 1, 7):
        with pytest.raises(ValueError):
            decode_bmp(good[:cut])
    # RLE on a top-down bitmap is illegal
    bad = bytearray(good)
    struct.pack_into("<i", bad, 14 + 8, -8)
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad))
    # RLE8 with 24-bit depth is illegal
    bad = bytearray(good)
    struct.pack_into("<H", bad, 14 + 14, 24)
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad))

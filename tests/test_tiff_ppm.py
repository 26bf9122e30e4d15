"""TIFF (uncompressed baseline) + PPM (P6) codecs: round trips, byte-order
and strip variants, and poison-pill behavior on malformed payloads."""
import struct

import numpy as np
import pytest

from ctdray.sources.media import decode_ppm, encode_ppm
from ctdray.sources.tiff import decode_tiff, encode_tiff
from ctdray.stages.multimodal import decode_image


def test_tiff_gray_roundtrip():
    rng = np.random.default_rng(5)
    for shape in ((1, 1), (9, 7), (64, 65)):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = decode_tiff(encode_tiff(img))
        assert out.shape == img.shape
        np.testing.assert_array_equal(out, img)


def test_tiff_color_roundtrip_bgr():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, size=(13, 21, 3), dtype=np.uint8)
    out = decode_tiff(encode_tiff(img))
    np.testing.assert_array_equal(out, img)          # BGR in, BGR out


def test_tiff_big_endian_and_multi_strip():
    """Hand-built MM (big-endian) file with two strips decodes exactly."""
    img = np.arange(48, dtype=np.uint8).reshape(6, 8)
    rows = img.tobytes()
    strip0, strip1 = rows[:24], rows[24:]
    e = ">"
    hdr = struct.pack(e + "2sHI", b"MM", 42, 8 + len(rows))
    body = strip0 + strip1

    def entry(tag, typ, count, value4):
        return struct.pack(e + "HHI4s", tag, typ, count, value4)

    def short(v):
        return struct.pack(e + "HH", v, 0)

    def long(v):
        return struct.pack(e + "I", v)

    # strip offsets/counts arrays live AFTER the IFD
    ifd_off = 8 + len(body)
    n = 9
    arr_off = ifd_off + 2 + n * 12 + 4
    entries = [
        entry(256, 3, 1, short(8)), entry(257, 3, 1, short(6)),
        entry(258, 3, 1, short(8)), entry(259, 3, 1, short(1)),
        entry(262, 3, 1, short(1)),
        entry(273, 4, 2, long(arr_off)),
        entry(277, 3, 1, short(1)), entry(278, 3, 1, short(3)),
        entry(279, 4, 2, long(arr_off + 8)),
    ]
    ifd = struct.pack(e + "H", n) + b"".join(entries) + long(0)
    arrays = struct.pack(e + "II", 8, 8 + 24) + struct.pack(e + "II", 24, 24)
    data = hdr + body + ifd + arrays
    np.testing.assert_array_equal(decode_tiff(data), img)


def test_tiff_whitesiszero_inverts():
    img = np.array([[0, 255], [10, 20]], np.uint8)
    data = bytearray(encode_tiff(img))
    # PhotometricInterpretation tag (262) value short 1 → 0
    i = data.find(struct.pack("<HHI", 262, 3, 1))
    assert i > 0
    struct.pack_into("<H", data, i + 8, 0)
    np.testing.assert_array_equal(decode_tiff(bytes(data)), 255 - img)


def test_tiff_malformed_raises():
    img = np.zeros((4, 4), np.uint8)
    good = encode_tiff(img)
    # note: truncating only the (unread) next-IFD pointer still decodes —
    # everything the image needs is present; cut into the IFD instead
    for bad in (b"", b"II", good[:10], good[:len(good) // 2],
                b"XX" + good[2:]):
        with pytest.raises(ValueError):
            decode_tiff(bad)
    # unsupported compression
    data = bytearray(good)
    i = data.find(struct.pack("<HHI", 259, 3, 1))
    struct.pack_into("<H", data, i + 8, 5)          # LZW
    with pytest.raises(ValueError):
        decode_tiff(bytes(data))


def test_ppm_roundtrip_and_dispatch():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(11, 5, 3), dtype=np.uint8)
    data = encode_ppm(img)
    np.testing.assert_array_equal(decode_ppm(data), img)
    np.testing.assert_array_equal(decode_image(data), img)
    with pytest.raises(ValueError):
        decode_ppm(data[:-4])
    with pytest.raises(ValueError):
        decode_ppm(b"P5" + data[2:])


def test_decode_image_dispatches_tiff():
    img = np.arange(42, dtype=np.uint8).reshape(6, 7)
    np.testing.assert_array_equal(decode_image(encode_tiff(img)), img)

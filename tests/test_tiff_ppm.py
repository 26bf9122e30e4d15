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


def _tiff_lzw_compress(payload: bytes) -> bytes:
    """Spec-faithful TIFF 6.0 LZW compressor (MSB-first, EARLY width
    change: widths switch one code sooner than GIF — TIFF 6.0 §13)."""
    clear, eoi = 256, 257
    width = 9
    out = bytearray()
    bits = bitpos = 0

    def emit(code):
        nonlocal bits, bitpos
        bits = (bits << width) | code
        bitpos += width
        while bitpos >= 8:
            out.append((bits >> (bitpos - 8)) & 0xFF)
            bitpos -= 8
            bits &= (1 << bitpos) - 1

    emit(clear)
    table = {(i,): i for i in range(256)}
    next_code = 258
    cur: tuple = ()
    for b in payload:
        cand = cur + (b,)
        if cand in table:
            cur = cand
            continue
        emit(table[cur])
        table[cand] = next_code
        next_code += 1
        # libtiff ordering (LZWEncode): widen right after assigning the new
        # entry once free_ent exceeds MAXCODE(nbits) = 2^n - 1 — one code
        # sooner than GIF, the TIFF 6.0 "early change".
        if next_code >= (1 << width) and width < 12:
            width += 1
        if next_code == 4094:              # spec: clear near table full
            emit(clear)
            width = 9
            table = {(i,): i for i in range(256)}
            next_code = 258
        cur = (b,)
    if cur:
        emit(table[cur])
    emit(eoi)
    if bitpos:
        out.append((bits << (8 - bitpos)) & 0xFF)
    return bytes(out)


def _lzw_tiff_file(img: np.ndarray, rows_per_strip=None,
                   predictor: int = 1) -> bytes:
    """Hand-built little-endian LZW TIFF (gray or RGB) with optional
    horizontal predictor and strip splitting."""
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else 3
    rows_per_strip = rows_per_strip or h
    px = img if spp == 1 else img[:, :, ::-1]       # BGR → RGB stored
    px = px.reshape(h, w, spp)
    if predictor == 2:
        d = px.astype(np.int16)
        d[:, 1:] = d[:, 1:] - d[:, :-1]
        px = (d % 256).astype(np.uint8)
    strips = []
    for r0 in range(0, h, rows_per_strip):
        strips.append(_tiff_lzw_compress(
            px[r0:r0 + rows_per_strip].tobytes()))
    n_strips = len(strips)
    # layout: header | strip data... | [arrays] | IFD
    data_off = 8
    offs, pos = [], data_off
    for s in strips:
        offs.append(pos)
        pos += len(s)
    body = b"".join(strips)
    arr_off = pos
    need_arrays = n_strips > 1
    arrays = b""
    if need_arrays:
        arrays = struct.pack(f"<{n_strips}I", *offs) \
            + struct.pack(f"<{n_strips}I", *[len(s) for s in strips])
    bits_off = arr_off + len(arrays)
    bits_extra = struct.pack("<3H", 8, 8, 8) if spp == 3 else b""
    ifd_off = bits_off + len(bits_extra)

    def entry(tag, typ, count, value4):
        return struct.pack("<HHI4s", tag, typ, count, value4)

    short = lambda v: struct.pack("<HH", v, 0)
    long = lambda v: struct.pack("<I", v)
    entries = [
        entry(256, 3, 1, short(w)), entry(257, 3, 1, short(h)),
        entry(258, 3, spp, long(bits_off) if spp == 3 else short(8)),
        entry(259, 3, 1, short(5)),        # LZW
        entry(262, 3, 1, short(2 if spp == 3 else 1)),
        entry(273, 4, n_strips,
              long(arr_off) if need_arrays else long(offs[0])),
        entry(277, 3, 1, short(spp)),
        entry(278, 3, 1, short(rows_per_strip)),
        entry(279, 4, n_strips,
              long(arr_off + 4 * n_strips) if need_arrays
              else long(len(strips[0]))),
        entry(284, 3, 1, short(1)),
        entry(317, 3, 1, short(predictor)),
    ]
    ifd = struct.pack("<H", len(entries)) + b"".join(entries) + long(0)
    return struct.pack("<2sHI", b"II", 42, ifd_off) + body + arrays \
        + bits_extra + ifd


def test_tiff_lzw_gray_roundtrip():
    rng = np.random.default_rng(8)
    # repetitive (deep chains + clears) and incompressible content
    tile = rng.integers(0, 6, size=(16, 16), dtype=np.uint8) * 40
    for img in (np.tile(tile, (8, 8)),
                rng.integers(0, 256, size=(40, 52), dtype=np.uint8)):
        out = decode_tiff(_lzw_tiff_file(img))
        np.testing.assert_array_equal(out, img)


def test_tiff_lzw_color_multistrip_predictor():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(30, 17, 3), dtype=np.uint8)
    for pred in (1, 2):
        out = decode_tiff(_lzw_tiff_file(img, rows_per_strip=7,
                                         predictor=pred))
        np.testing.assert_array_equal(out, img)


def test_tiff_lzw_truncated_raises():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    good = _lzw_tiff_file(img)
    with pytest.raises(ValueError):
        decode_tiff(good[:20])


def _with_metadata_tags(data: bytes) -> bytes:
    """Append typical scanner metadata to an encode_tiff file: ASCII
    Software (305), RATIONAL X/YResolution (282/283) and a FLOAT vendor
    tag — none needed for pixel decode, all must be skipped gracefully."""
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    entries = data[ifd_off + 2: ifd_off + 2 + n * 12]
    base = data[:ifd_off]                       # header + pixel payload
    soft = b"mock scanner v1\x00"
    rat = struct.pack("<II", 300, 1)
    soft_off = len(base)
    xres_off = soft_off + len(soft)
    yres_off = xres_off + 8
    new_ifd_off = yres_off + 8
    extra = [
        struct.pack("<HHII", 282, 5, 1, xres_off),   # XResolution RATIONAL
        struct.pack("<HHII", 283, 5, 1, yres_off),   # YResolution RATIONAL
        struct.pack("<HHII", 305, 2, len(soft), soft_off),  # Software ASCII
        struct.pack("<HHIf", 34377, 11, 1, 1.0),     # FLOAT vendor tag
    ]
    ifd = struct.pack("<H", n + len(extra)) + entries + b"".join(extra) \
        + struct.pack("<I", 0)
    out = bytearray(base) + soft + rat + rat + ifd
    struct.pack_into("<I", out, 4, new_ifd_off)
    return bytes(out)


def test_tiff_metadata_tags_are_skipped():
    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, size=(9, 14), dtype=np.uint8)
    color = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    for img in (gray, color):
        out = decode_tiff(_with_metadata_tags(encode_tiff(img)))
        np.testing.assert_array_equal(out, img)


def test_pnm_16bit_strips_to_high_byte():
    """maxval > 255 PNM files carry two-byte big-endian samples; decode
    strips to the high byte (cv2's 16U → 8U read)."""
    rng = np.random.default_rng(61)
    g16 = rng.integers(0, 1 << 16, size=(9, 7), dtype=np.uint16)
    pgm = f"P5\n7 9\n65535\n".encode() + g16.astype(">u2").tobytes()
    np.testing.assert_array_equal(decode_image(pgm),
                                  (g16 >> 8).astype(np.uint8))
    from ctdray.stages.multimodal import probe_image_dims
    assert probe_image_dims(pgm) == (9, 7)
    c16 = rng.integers(0, 1 << 16, size=(5, 6, 3), dtype=np.uint16)
    ppm = f"P6\n6 5\n65535\n".encode() + c16.astype(">u2").tobytes()
    out = decode_image(ppm)
    np.testing.assert_array_equal(out,
                                  (c16 >> 8).astype(np.uint8)[:, :, ::-1])
    # maxval 0 / >65535 still poison-pill; truncation still raises
    with pytest.raises(ValueError):
        decode_image(b"P5\n4 4\n0\n" + bytes(16))
    with pytest.raises(ValueError):
        decode_image(b"P5\n4 4\n70000\n" + bytes(64))
    with pytest.raises(ValueError):
        decode_image(pgm[:-5])

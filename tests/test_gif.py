"""GIF codec (ctdray.sources.gif): LZW decode round trips (width growth,
clear handling), interlace, palettes, extensions, frame offsets, and the
poison-pill contract."""
import struct

import numpy as np
import pytest

from ctdray.sources.gif import decode_gif, encode_gif
from ctdray.stages.multimodal import decode_image


def test_gray_roundtrip_exact():
    rng = np.random.default_rng(1)
    for shape in ((1, 1), (5, 9), (40, 61), (90, 33)):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = decode_gif(encode_gif(img))
        assert out.shape == img.shape
        np.testing.assert_array_equal(out, img)


def test_dispatch_via_decode_image():
    img = np.arange(35, dtype=np.uint8).reshape(5, 7)
    np.testing.assert_array_equal(decode_image(encode_gif(img)), img)


def _interlace_order(h):
    rows = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        rows.extend(range(start, h, step))
    return rows


def test_interlaced_frame_deinterlaces():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(23, 11), dtype=np.uint8)
    order = _interlace_order(23)
    data = bytearray(encode_gif(img[order]))   # rows stored in pass order
    # image descriptor starts right after header+LSD+GCT (6+7+768)
    desc = 6 + 7 + 768
    assert data[desc] == 0x2C
    data[desc + 9] |= 0x40                     # set interlace flag
    np.testing.assert_array_equal(decode_gif(bytes(data)), img)


def test_extension_blocks_skipped_and_first_frame_offset():
    img = np.full((4, 6), 9, np.uint8)
    base = encode_gif(img)
    desc = 6 + 7 + 768
    # insert a graphic-control extension before the image descriptor
    gce = b"\x21\xF9\x04\x00\x00\x00\x00\x00"
    data = base[:desc] + gce + base[desc:]
    np.testing.assert_array_equal(decode_gif(data), img)

    # frame placed at an offset inside a larger logical screen
    data2 = bytearray(base[:desc] )
    struct.pack_into("<HH", data2, 6, 10, 8)   # screen 10x8
    body = bytearray(base[desc:])
    struct.pack_into("<HHHH", body, 1, 3, 2, 6, 4)  # frame at (3,2)
    out = decode_gif(bytes(data2) + bytes(body))
    assert out.shape == (8, 10)
    np.testing.assert_array_equal(out[2:6, 3:9], img)
    assert (out[:2] == 0).all() and (out[:, :3] == 0).all()


def test_color_palette_returns_bgr():
    img = np.array([[0, 1], [2, 3]], np.uint8)
    data = bytearray(encode_gif(img))
    # overwrite the first 4 palette entries with distinct RGB colors
    pal_off = 13
    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    for i, (r, g, b) in enumerate(colors):
        data[pal_off + 3 * i: pal_off + 3 * i + 3] = bytes((r, g, b))
    out = decode_gif(bytes(data))
    assert out.shape == (2, 2, 3)
    # BGR convention
    np.testing.assert_array_equal(out[0, 0], [0, 0, 255])
    np.testing.assert_array_equal(out[0, 1], [0, 255, 0])
    np.testing.assert_array_equal(out[1, 0], [255, 0, 0])
    np.testing.assert_array_equal(out[1, 1], [30, 20, 10])


def test_malformed_raises_valueerror():
    img = np.zeros((6, 6), np.uint8)
    good = encode_gif(img)
    for bad in (b"", b"GIF89a", good[:20], good[:len(good) - 8],
                b"XIF89a" + good[6:]):
        with pytest.raises(ValueError):
            decode_gif(bad)
    # no image frame at all
    with pytest.raises(ValueError):
        decode_gif(good[:13 + 768] + b"\x3B")


def test_large_image_exercises_clear_codes():
    """>253 pixels forces the encoder's periodic Clear codes — the decoder
    must resync width/dictionary every time."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    np.testing.assert_array_equal(decode_gif(encode_gif(img)), img)


def _real_lzw_gif(img: np.ndarray) -> bytes:
    """A genuinely-compressing GIF LZW encoder (dictionary + variable code
    width) so the decoder's chain expansion, KwKwK case and width growth
    beyond 9 bits all execute — the in-repo encoder is literal-only."""
    h, w = img.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    g = np.arange(256, dtype=np.uint8)
    out += np.stack([g, g, g], 1).tobytes()
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out += bytes([8])
    clear, eoi = 256, 257
    bits = bitpos = 0
    acc = bytearray()
    width = 9

    def emit(code):
        nonlocal bits, bitpos
        bits |= code << bitpos
        bitpos += width
        while bitpos >= 8:
            acc.append(bits & 0xFF)
            bits >>= 8
            bitpos -= 8

    emit(clear)
    table = {(i,): i for i in range(256)}
    next_code = 258
    cur: tuple = ()
    for px in img.reshape(-1).tolist():
        cand = cur + (px,)
        if cand in table:
            cur = cand
            continue
        emit(table[cur])
        # giflib ordering (EGifCompressOutput): widen AFTER writing the
        # code and BEFORE assigning the new entry, once the next code to
        # assign no longer fits the current width (RunningCode >= MaxCode1).
        if next_code >= (1 << width) and width < 12:
            width += 1
        table[cand] = next_code
        next_code += 1
        if next_code == 4096:
            emit(clear)
            width = 9
            table = {(i,): i for i in range(256)}
            next_code = 258
        cur = (px,)
    if cur:
        emit(table[cur])
    emit(eoi)
    if bitpos:
        acc.append(bits & 0xFF)
    for i in range(0, len(acc), 255):
        chunk = acc[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3B"
    return bytes(out)


def test_real_lzw_stream_decodes_exactly():
    rng = np.random.default_rng(4)
    # repetitive content → deep dictionary chains + KwKwK occurrences
    tile = rng.integers(0, 8, size=(16, 16), dtype=np.uint8) * 30
    img = np.tile(tile, (8, 8))                    # 128x128, heavy repeats
    data = _real_lzw_gif(img)
    assert len(data) < img.size                     # actually compressed
    np.testing.assert_array_equal(decode_gif(data), img)

    # and an incompressible one (width growth to 10+ bits, no clears)
    img2 = rng.integers(0, 256, size=(48, 48), dtype=np.uint8)
    np.testing.assert_array_equal(decode_gif(_real_lzw_gif(img2)), img2)


def test_truncated_gce_raises_valueerror():
    """A graphic-control extension cut short mid-sub-block must raise
    ValueError (poison-pill contract), not IndexError."""
    head = b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0xF7, 0, 0)
    g = np.arange(256, dtype=np.uint8)
    pal = np.stack([g, g, g], 1).tobytes()
    # GCE declares a 4-byte sub-block with the transparency flag set, but
    # the payload ends after the flag byte
    data = head + pal + b"\x21\xF9\x04\x01"
    with pytest.raises(ValueError):
        decode_gif(data)

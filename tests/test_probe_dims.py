"""Header-only shape probe (stages.multimodal.probe_image_dims): probed
dims must equal full-decode dims across the whole codec matrix, unsupported
variants must poison-pill at probe time, and DecodeStage(keep_pixels=False)
must produce the same rows as before via the probe path."""
import struct

import numpy as np
import pytest

from ctdray.sources.bmp import encode_bmp
from ctdray.sources.gif import encode_gif
from ctdray.sources.jpeg import encode_baseline_jpeg, encode_progressive_jpeg
from ctdray.sources.media import encode_pgm, encode_ppm
from ctdray.sources.png import encode_png
from ctdray.sources.tiff import encode_tiff
from ctdray.stages.multimodal import decode_image, probe_image_dims


def _payload_matrix():
    rng = np.random.default_rng(31)
    gray = rng.integers(0, 256, size=(24, 17), dtype=np.uint8)
    color = rng.integers(0, 256, size=(11, 19, 3), dtype=np.uint8)
    yield "pgm", encode_pgm(gray)
    yield "ppm", encode_ppm(color)
    yield "png-gray", encode_png(gray)
    yield "png-rgb", encode_png(color)
    yield "jpeg-gray", encode_baseline_jpeg(gray)
    yield "jpeg-color", encode_baseline_jpeg(color)
    yield "jpeg-progressive", encode_progressive_jpeg(gray)
    yield "bmp-gray", encode_bmp(gray)
    yield "bmp-color", encode_bmp(color)
    yield "tiff-gray", encode_tiff(gray)
    yield "tiff-color", encode_tiff(color)
    yield "gif", encode_gif(gray)
    # 16-bit PNG via the test builder from test_png16
    from tests.test_png16 import _png16
    arr16 = rng.integers(0, 1 << 16, size=(9, 13), dtype=np.uint16)
    yield "png16", _png16(arr16, (0, 2, 4))
    yield "png16-adam7", _png16(arr16, (1,), interlace=1)


def test_probe_matches_full_decode_dims():
    for name, payload in _payload_matrix():
        probed = probe_image_dims(payload)
        full = decode_image(payload).shape[:2]
        assert probed == full, (name, probed, full)


def test_probe_rejects_unsupported_variants():
    rng = np.random.default_rng(32)
    gray = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    # PNG depth 3 (not a legal PNG depth for any color type)
    png = bytearray(encode_png(gray))
    png[8 + 8 + 8] = 3                       # IHDR depth byte
    with pytest.raises(ValueError):
        probe_image_dims(bytes(png))
    # arithmetic-coded JPEG: rewrite SOF0 marker to SOF9
    jpg = bytearray(encode_baseline_jpeg(gray))
    i = jpg.find(b"\xFF\xC0")
    assert i > 0
    jpg[i + 1] = 0xC9
    with pytest.raises(ValueError):
        probe_image_dims(bytes(jpg))
    # TIFF with unsupported compression
    tif = bytearray(encode_tiff(gray))
    i = tif.find(struct.pack("<HHI", 259, 3, 1))
    struct.pack_into("<H", tif, i + 8, 7)    # JPEG-in-TIFF
    with pytest.raises(ValueError):
        probe_image_dims(bytes(tif))
    # unknown magic → NotImplementedError (decode_image fallback signal)
    with pytest.raises(NotImplementedError):
        probe_image_dims(b"RIFF....WEBPVP8 ")
    # truncated headers → ValueError, never IndexError
    for _name, payload in _payload_matrix():
        for cut in (3, 9, 14):
            try:
                probe_image_dims(payload[:cut])
            except (ValueError, NotImplementedError):
                pass


def test_decode_stage_probe_path_matches_full_decode():
    import pyarrow as pa

    from ctdray.sources.media import decode_page
    from ctdray.stages.decode import DecodeStage

    refs = ["page://doc-0001/p0", "jpg://doc-0002/p1", "pjpg://doc-0003/p0",
            "bmp://doc-0004/p2", "tif://doc-0005/p0", "gif://doc-0006/p1"]
    batch = pa.table({
        "doc_id": pa.array([r.split("//")[1].split("/")[0] for r in refs]),
        "media_offset": pa.array(range(len(refs)), pa.int32()),
        "media_ref": pa.array(refs),
    })
    rows = DecodeStage(keep_pixels=False)(batch).to_pylist()
    for row in rows:
        assert row["decode_ok"] is True
        img = decode_page(row["media_ref"])
        assert (row["im_h"], row["im_w"]) == img.shape[:2], row["media_ref"]


def test_probe_rejects_oversized_png_dims():
    """A PNG IHDR claiming width >= 2^31 must poison-pill at probe time —
    never flow into DecodeStage's int32 dims (silent wrap / OverflowError)."""
    import pyarrow as pa

    from ctdray.stages.decode import DecodeStage

    png = bytearray(encode_png(np.zeros((4, 4), np.uint8)))
    struct.pack_into(">I", png, 16, 0x90000000)     # IHDR width field
    with pytest.raises(ValueError):
        probe_image_dims(bytes(png))
    # and the stage degrades to an error row, not a crash
    import ctdray.stages.decode as decode_mod
    ref = "page://doc-0001/p0"
    orig = decode_mod.fetch_media
    decode_mod.fetch_media = lambda r: bytes(png) if r == ref else orig(r)
    try:
        batch = pa.table({"doc_id": ["a"],
                          "media_offset": pa.array([0], pa.int32()),
                          "media_ref": [ref]})
        row = DecodeStage(keep_pixels=False)(batch).to_pylist()[0]
        assert row["decode_ok"] is False
    finally:
        decode_mod.fetch_media = orig


def test_tiff_critical_tag_with_bad_type_raises():
    """Compression/BitsPerSample carrying an unparseable field type must
    fail loudly — skipping them would misdecode pixels with defaults."""
    from ctdray.sources.tiff import decode_tiff, probe_dims

    gray = np.arange(16, dtype=np.uint8).reshape(4, 4)
    tif = bytearray(encode_tiff(gray))
    i = tif.find(struct.pack("<HHI", 259, 3, 1))    # Compression tag
    assert i > 0
    struct.pack_into("<H", tif, i + 2, 8)           # type → SSHORT
    with pytest.raises(ValueError):
        decode_tiff(bytes(tif))
    with pytest.raises(ValueError):
        probe_dims(bytes(tif))

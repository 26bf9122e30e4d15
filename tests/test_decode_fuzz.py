"""Decoder robustness fuzz: web-scale corpora are full of truncated and
bit-flipped media.  Every codec (PGM, PNG, baseline + progressive JPEG,
CTVF, WAV) must turn ANY corrupted payload into ValueError — the decode
stage's poison-pill contract (SURVEY.md §4) — never a crash, hang, or a
silent wrong-shaped success, and decode_image must never raise anything
but ValueError/NotImplementedError."""
import numpy as np
import pytest

from ctdray.sources.jpeg import (decode_jpeg, encode_baseline_jpeg,
                                 encode_progressive_jpeg)
from ctdray.stages.multimodal import decode_image


def _payloads():
    rng = np.random.default_rng(3)
    img = (rng.integers(0, 256, (40, 56), dtype=np.uint8) // 3 + 90) \
        .astype(np.uint8)
    color = np.stack([img, 255 - img, img], axis=-1)
    from ctdray.sources.bmp import encode_bmp
    from ctdray.sources.gif import encode_gif
    from ctdray.sources.media import encode_pgm, synth_video, synth_wav
    from ctdray.sources.png import encode_png

    return {
        "pgm": encode_pgm(img),
        "png": encode_png(img),
        "bmp": encode_bmp(img),
        "gif": encode_gif(img),
        "jpg": encode_baseline_jpeg(color, quality=85),
        "pjpg": encode_progressive_jpeg(color, quality=85),
        "ctvf": synth_video("vid://fuzz/x"),
        "wav": synth_wav("aud://fuzz/x"),
    }


@pytest.mark.parametrize("kind", ["pgm", "png", "bmp", "gif", "jpg", "pjpg"])
def test_truncations_raise_valueerror(kind):
    data = _payloads()[kind]
    full = decode_image(data)
    lossy = kind in ("jpg", "pjpg")
    for frac in (0.05, 0.3, 0.6, 0.9, 0.98):
        cut = data[: int(len(data) * frac)]
        try:
            out = decode_image(cut)
        except (ValueError, NotImplementedError):
            continue
        # A prefix that still decodes must keep the declared shape.  The
        # LOSSLESS formats must additionally be value-identical (their
        # lengths are explicit, so any decodable prefix is the full image);
        # a near-complete JPEG may legally finish the last MCUs from pad
        # bits — same lenient-trailing behavior as cv2.imdecode.
        assert out.shape == full.shape, f"{kind} truncated to {frac}"
        if not lossy:
            assert np.array_equal(out, full), \
                f"{kind} truncated to {frac} decoded differently"


@pytest.mark.parametrize("kind", ["pgm", "png", "bmp", "gif", "jpg", "pjpg"])
def test_bitflips_never_crash(kind):
    """200 random single-byte corruptions per format: decode either raises
    ValueError/NotImplementedError or returns a uint8 array — nothing else
    escapes (IndexError/ZeroDivisionError/segfault-adjacent paths)."""
    data = bytearray(_payloads()[kind])
    rng = np.random.default_rng(11)
    for _ in range(200):
        i = int(rng.integers(0, len(data)))
        old = data[i]
        data[i] = int(rng.integers(0, 256))
        try:
            out = decode_image(bytes(data))
            assert isinstance(out, np.ndarray) and out.dtype == np.uint8
        except (ValueError, NotImplementedError):
            pass
        finally:
            data[i] = old


def test_media_container_truncations():
    from ctdray.sources.media import (decode_ctvf, decode_wav, synth_video,
                                      synth_wav)

    vid = synth_video("vid://fuzz/y")
    wav = synth_wav("aud://fuzz/y")
    for frac in (0.1, 0.5, 0.95):
        with pytest.raises(ValueError):
            decode_ctvf(vid[: int(len(vid) * frac)])
    # WAV: truncation either raises or yields a shorter-but-valid PCM view
    for frac in (0.1, 0.5, 0.95):
        try:
            pcm, sr = decode_wav(wav[: int(len(wav) * frac)])
            assert sr > 0 and pcm.ndim == 1
        except ValueError:
            pass


def test_decode_stage_rows_degrade_not_crash():
    """A batch mixing a good page, an unresolvable ref and a corrupt
    payload ref yields per-row decode_ok flags — the pipeline-level
    poison-pill behavior."""
    import pyarrow as pa

    from ctdray.stages.decode import DecodeStage

    batch = pa.table({
        "doc_id": pa.array(["a", "b", "c"]),
        "media_offset": pa.array([0, 1, 2], pa.int32()),
        "media_ref": pa.array(["page://doc-0001/p0",
                               "bogus://nope",
                               "webp://unknown-codec"]),
    })
    rows = DecodeStage(keep_pixels=False)(batch).to_pylist()
    by_ref = {r["media_ref"]: r for r in rows}
    assert by_ref["page://doc-0001/p0"]["decode_ok"] is True
    assert by_ref["bogus://nope"]["decode_ok"] is False
    assert by_ref["webp://unknown-codec"]["decode_ok"] is False


@pytest.mark.parametrize("kind", ["pgm", "png", "bmp", "gif", "jpg", "pjpg"])
def test_probe_truncations_and_bitflips_raise_valueerror(kind):
    """probe_image_dims shares decode_image's poison-pill contract: any
    truncated or bit-flipped payload yields ValueError (or
    NotImplementedError when the mutation destroys the magic), never a
    crash — and when a corrupted payload still probes, the dims must be
    sane non-negatives."""
    from ctdray.stages.multimodal import probe_image_dims

    data = _payloads()[kind]
    rng = np.random.default_rng(11)
    muts = [data[:k] for k in (0, 1, 3, 7, 11, 16, 25, len(data) // 2)]
    for _ in range(40):
        b = bytearray(data)
        for _ in range(int(rng.integers(1, 4))):
            b[int(rng.integers(0, min(len(b), 64)))] = int(rng.integers(256))
        muts.append(bytes(b))
    for payload in muts:
        try:
            h, w = probe_image_dims(payload)
        except (ValueError, NotImplementedError):
            continue
        assert h > 0 and w > 0

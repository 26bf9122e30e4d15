"""SurrogateDetector output-map buffer reuse (dirty-rect reset).

The reused-buffer detector must be indistinguishable from a fresh detector
per page: after zeroing exactly the rects painted by the previous call, the
canvas is pristine (every nonzero pixel lies inside a recorded
fill_convex_poly bbox, by induction from a zero buffer).  These tests pin
that invariant over page sequences that exercise both fill paths
(axis-aligned slice fill and the rotated half-plane fill) and the
consumption contract (maps valid until the next ``infer``).
"""
import numpy as np
import pytest

from ctdray.config import DetectorConfig
from ctdray.detect_core import detect_page, page_line_spans
from ctdray.fixtures import make_media_ref
from ctdray.surrogate import SurrogateDetector
from ctdray.sources.media import decode_page


def _page_seq(n=12):
    """A spread of fixture pages (different seeds → different block layouts,
    some with rotated lines / noise quads)."""
    refs = [make_media_ref(doc_id=i * 97 + 3, offset=i % 5) for i in range(n)]
    out = []
    for r in refs:
        img = decode_page(r)
        out.append((r, img.shape[0], img.shape[1]))
    return out


def test_reused_maps_bit_identical_to_fresh():
    cfg = DetectorConfig()
    reused = SurrogateDetector(cfg, reuse_buffers=True)
    for ref, h, w in _page_seq():
        fresh = SurrogateDetector(cfg, reuse_buffers=False)
        b_r, m_r, l_r = reused.infer(ref, h, w)
        b_f, m_f, l_f = fresh.infer(ref, h, w)
        np.testing.assert_array_equal(b_r, b_f)
        np.testing.assert_array_equal(np.asarray(m_r), np.asarray(m_f))
        np.testing.assert_array_equal(np.asarray(l_r), np.asarray(l_f))


def test_reuse_default_on_and_buffers_shared():
    det = SurrogateDetector()
    assert det._reuse
    (ref, h, w), (ref2, h2, w2) = _page_seq(2)
    _, m1, l1 = det.infer(ref, h, w)
    _, m2, l2 = det.infer(ref2, h2, w2)
    # Same backing buffer both calls — the reuse actually happened.
    assert np.asarray(m1).base is not None or np.shares_memory(
        np.asarray(m1), np.asarray(m2))
    assert np.shares_memory(np.asarray(l1), np.asarray(l2))


def test_detect_page_spans_identical_under_reuse():
    cfg = DetectorConfig()
    reused = SurrogateDetector(cfg, reuse_buffers=True)
    for ref, h, w in _page_seq():
        blocks_r, _ = detect_page(reused, ref, h, w, cfg)
        blocks_f, _ = detect_page(SurrogateDetector(cfg, reuse_buffers=False),
                                  ref, h, w, cfg)
        assert page_line_spans(blocks_r) == page_line_spans(blocks_f)


def test_lines_channel1_stays_zero():
    det = SurrogateDetector()
    for ref, h, w in _page_seq(6):
        _, _, lines = det.infer(ref, h, w)
        assert not np.asarray(lines)[0, 1].any()


def test_unreused_detector_allocates_fresh():
    det = SurrogateDetector(reuse_buffers=False)
    (ref, h, w), (ref2, h2, w2) = _page_seq(2)
    _, m1, _ = det.infer(ref, h, w)
    m1_copy = np.asarray(m1).copy()
    det.infer(ref2, h2, w2)
    np.testing.assert_array_equal(np.asarray(m1), m1_copy)

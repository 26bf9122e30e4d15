"""DB representer: bitmap → scored quads (reference parity points:
binarize 0.3, sside<2 skip, unclip 1.5, caller score gate 0.6)."""
import numpy as np

from ctdray.config import DetectorConfig
from ctdray.geom import fill_convex_poly, shrink_poly
from ctdray.represent import boxes_from_bitmap, extract_lines


def test_recovers_axis_aligned_rects():
    pred = np.zeros((256, 256), dtype=np.float32)
    gt = np.array([[40.0, 40.0], [160.0, 40.0], [160.0, 70.0], [40.0, 70.0]])
    fill_convex_poly(pred, shrink_poly(gt, 0.4), 0.95)
    boxes, scores = boxes_from_bitmap(pred, thresh=0.3)
    assert len(boxes) == 1
    assert scores[0] > 0.9
    box = boxes[0]
    # unclip(minrect(shrink(gt))) ≈ gt within a few px
    assert np.abs(box - gt).max() < 6


def test_score_gate_filters_low_blobs():
    cfg = DetectorConfig()
    pred = np.zeros((2, 256, 256), dtype=np.float32)
    good = np.array([[40.0, 40.0], [160.0, 40.0], [160.0, 70.0], [40.0, 70.0]])
    fill_convex_poly(pred[0], shrink_poly(good, 0.4), 0.95)
    noise = np.array([[40.0, 120.0], [160.0, 120.0], [160.0, 150.0], [40.0, 150.0]])
    fill_convex_poly(pred[0], noise, 0.45)          # > binarize, < box_thresh
    tiny = np.array([[200.0, 200.0], [201.0, 200.0], [201.0, 201.0], [200.0, 201.0]])
    fill_convex_poly(pred[0], tiny, 0.95)           # sside < 2
    lines, scores = extract_lines(pred, cfg)
    assert len(lines) == 1
    assert np.all(scores > cfg.box_thresh)


def test_rotated_rect_recovered():
    pred = np.zeros((256, 256), dtype=np.float32)
    base = np.array([[-60.0, -15.0], [60.0, -15.0], [60.0, 15.0], [-60.0, 15.0]])
    a = np.deg2rad(30)
    rot = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
    quad = base @ rot.T + [128, 128]
    fill_convex_poly(pred, shrink_poly(quad, 0.4), 0.95)
    boxes, scores = boxes_from_bitmap(pred, thresh=0.3)
    assert len(boxes) == 1
    box = boxes[0].astype(np.float64)
    # recovered box center ≈ quad center; long edge ≈ 30° slope
    np.testing.assert_allclose(box.mean(axis=0), [128, 128], atol=4)
    e = box[1] - box[0]
    ang = abs(np.rad2deg(np.arctan2(e[1], e[0])))
    assert min(ang, abs(ang - 180)) % 180 - 30 < 6


def test_empty_map():
    lines, scores = extract_lines(np.zeros((2, 64, 64), np.float32), DetectorConfig())
    assert len(lines) == 0


def test_max_candidates_cap():
    pred = np.zeros((200, 200), dtype=np.float32)
    for i in range(6):
        for j in range(6):
            q = np.array([[5 + 30 * i, 5 + 30 * j], [25 + 30 * i, 5 + 30 * j],
                          [25 + 30 * i, 25 + 30 * j], [5 + 30 * i, 25 + 30 * j]],
                         dtype=np.float64)
            fill_convex_poly(pred, q, 0.95)
    boxes, _ = boxes_from_bitmap(pred, thresh=0.3, max_candidates=10)
    assert len(boxes) == 10   # capped in scan order (utils/db_utils.py:137)


def test_boxes_from_bitmap_active_rows_band_exact():
    """active_rows: restricting the scan to a row band that bounds every
    above-threshold pixel yields the identical boxes/scores (row
    coordinates shifted back to map space), including components touching
    the band edges; an empty band returns the empty shapes."""
    import numpy as np

    from ctdray.represent import boxes_from_bitmap

    rng = np.random.default_rng(3)
    pred = np.zeros((256, 256), np.float32)
    pred[40:60, 30:120] = 0.9          # touches the band's first row
    pred[100:130, 50:80] = 0.8
    pred[150:170, 200:240] = 0.95      # touches the band's last row
    full = boxes_from_bitmap(pred)
    banded = boxes_from_bitmap(pred, active_rows=(40, 170))
    assert np.array_equal(full[0], banded[0])
    assert np.array_equal(full[1], banded[1])
    # superset band
    wide = boxes_from_bitmap(pred, active_rows=(10, 250))
    assert np.array_equal(full[0], wide[0])
    assert np.array_equal(full[1], wide[1])
    # empty band
    b, s = boxes_from_bitmap(np.zeros((64, 64), np.float32),
                             active_rows=(0, 0))
    assert b.shape == (0, 4, 2) and s.shape == (0,)


def test_detect_page_band_equals_full_scan():
    """detect_page with the surrogate's paint-rect band must produce the
    same spans as a postprocess over the full map (the band is a guarantee,
    not an approximation)."""
    import numpy as np

    from ctdray.config import DetectorConfig
    from ctdray.detect_core import (detect_page, infer_page_arrays,
                                    page_line_spans, postprocess_page)
    from ctdray.fixtures import make_media_ref
    from ctdray.sources.media import decode_page
    from ctdray.surrogate import SurrogateDetector

    cfg = DetectorConfig()
    det = SurrogateDetector(cfg)
    for i in range(8):
        ref = make_media_ref(doc_id=i * 173 + 11, offset=i % 3)
        img = decode_page(ref)
        h, w = img.shape[:2]
        blocks_band, _ = detect_page(det, ref, h, w, cfg)
        blks, m, l0 = infer_page_arrays(det, ref, h, w, cfg, compact=False)
        blocks_full, _ = postprocess_page(blks, m, l0, h, w, cfg)
        assert page_line_spans(blocks_band) == page_line_spans(blocks_full)

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

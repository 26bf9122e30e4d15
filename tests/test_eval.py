"""AG1-AG3: polygon IoU, greedy matching, distributive P/R/F1."""
import numpy as np
import pytest

from ctdray.eval import clip_convex, combine_results, evaluate_page, quad_iou
from ctdray.geom import polygon_area


def _rect(x1, y1, x2, y2):
    return np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2]], dtype=np.float64)


def test_clip_convex_known_areas():
    a = _rect(0, 0, 10, 10)
    b = _rect(5, 5, 15, 15)
    inter = clip_convex(a, b)
    assert polygon_area(np.array(inter)) == pytest.approx(25.0)
    # disjoint
    assert clip_convex(_rect(0, 0, 2, 2), _rect(5, 5, 6, 6)) == []
    # containment
    inner = _rect(2, 2, 4, 4)
    assert polygon_area(np.array(clip_convex(inner, a))) == pytest.approx(4.0)
    # winding-insensitive
    assert polygon_area(np.array(clip_convex(a[::-1], b[::-1]))) == pytest.approx(25.0)


def test_quad_iou_values():
    a = _rect(0, 0, 10, 10)
    assert quad_iou(a, a) == pytest.approx(1.0)
    assert quad_iou(a, _rect(20, 20, 30, 30)) == 0.0
    b = _rect(0, 0, 10, 5)
    assert quad_iou(a, b) == pytest.approx(0.5)
    # rotated 45° square inside
    c = np.array([[5, 0], [10, 5], [5, 10], [0, 5]], dtype=np.float64)
    assert quad_iou(a, c) == pytest.approx(50.0 / 100.0)


def test_evaluate_page_greedy_matching():
    gts = [_rect(0, 0, 10, 10), _rect(20, 0, 30, 10)]
    dets = [_rect(0, 0, 10, 10), _rect(50, 50, 60, 60)]
    g, d, m = evaluate_page(gts, dets)
    assert (g, d, m) == (2, 2, 1)
    # a det can match only one gt (1-1)
    g, d, m = evaluate_page([_rect(0, 0, 10, 10), _rect(1, 1, 10, 10)],
                            [_rect(0, 0, 10, 10)])
    assert m == 1


def test_combine_results_micro():
    r = combine_results(10, 8, 6)
    assert r["recall"] == pytest.approx(0.6)
    assert r["precision"] == pytest.approx(0.75)
    assert r["hmean"] == pytest.approx(2 * 0.6 * 0.75 / 1.35)
    assert combine_results(0, 0, 0)["hmean"] == 0.0


def test_detection_quality_distributed(ray_session):
    import ray.data as rd

    from ctdray.eval import detection_quality
    from ctdray.fixtures import make_corpus

    res = detection_quality(rd.from_arrow(make_corpus(8))).to_pylist()[0]
    # the surrogate plants detectable lines: recall/precision should be high
    assert res["gt_care"] > 0 and res["det_care"] > 0
    assert res["hmean"] > 0.5


def test_dont_care_filtering_flips_precision():
    """AG1: a detection inside a don't-care GT region must leave the care
    counts (utils/db_utils.py:333-342) — mishandling it drags precision."""
    import numpy as np

    from ctdray.eval import combine_results, evaluate_page

    sq = lambda x, y, s: np.array([[x, y], [x + s, y], [x + s, y + s], [x, y + s]])
    gt = [sq(0, 0, 10), sq(50, 50, 10)]          # second is don't-care
    det = [sq(0, 0, 10), sq(51, 51, 8)]          # second lands inside it
    g, d, m = evaluate_page(gt, det, gt_ignore=[False, True])
    assert (g, d, m) == (1, 1, 1)
    assert combine_results(g, d, m)["precision"] == 1.0
    # without the ignore flag the stray det counts and precision drops
    g2, d2, m2 = evaluate_page(gt, det)
    assert combine_results(g2, d2, m2)["precision"] == 1.0  # it matches gt2!
    # a det in a don't-care region that matches nothing:
    det3 = [sq(0, 0, 10), sq(52, 53, 4)]         # too small to match gt2
    ga, da, ma = evaluate_page(gt, det3, gt_ignore=[False, True])
    assert combine_results(ga, da, ma)["precision"] == 1.0
    gb, db, mb = evaluate_page(gt, det3)
    assert combine_results(gb, db, mb)["precision"] == 0.5

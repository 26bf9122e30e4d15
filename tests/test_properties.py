"""Hypothesis property tests for the geometry kernels (SURVEY.md §5)."""
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ctdray import geom

# Integer coordinates — the kernel's real inputs are CC-run boundary pixels
# (sub-2px rects are filtered by the sside gate, represent.py); adversarial
# 1e-130-scale float degeneracies are out of the input domain.
_coord = st.integers(min_value=-500, max_value=500)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(_coord, _coord), min_size=3, max_size=40))
def test_min_area_rect_contains_all_points(pts):
    pts = np.array(pts, dtype=np.float64)
    corners, wh = geom.min_area_rect(pts)
    if min(wh) < 1e-9:                  # degenerate: collinear input
        return
    # every point inside the rect (within fp tolerance): project onto the
    # rect's edge axes and check the interval
    e1 = corners[1] - corners[0]
    e2 = corners[3] - corners[0]
    for v, e in ((e1, e1), (e2, e2)):
        n2 = float(e @ e)
        t = ((pts - corners[0]) @ e) / n2
        assert t.min() >= -1e-7 and t.max() <= 1 + 1e-7


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=1, max_value=60), st.integers(0, 2 ** 31 - 1))
def test_nms_output_is_conflict_free(n, seed):
    rng = np.random.default_rng(seed)
    boxes = rng.uniform(0, 300, (n, 4))
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 60, (n, 2))
    scores = rng.uniform(0.01, 1, n)
    keep = geom.nms_boxes(boxes, scores, 0.35)
    kept = boxes[keep]
    # no two survivors overlap above the threshold
    if len(kept) > 1:
        iou = geom.box_iou_matrix(kept, kept)
        np.fill_diagonal(iou, 0)
        assert iou.max() <= 0.35 + 1e-9
    # survivors are in descending score order
    s = scores[keep]
    assert all(s[i] >= s[i + 1] for i in range(len(s) - 1))


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2 ** 31 - 1))
def test_connected_components_partition_foreground(seed):
    rng = np.random.default_rng(seed)
    m = rng.random((25, 30)) < 0.4
    comps = geom.connected_component_runs(m, connectivity=8)
    total = sum(int((e - s).sum()) for _, s, e in comps)
    assert total == int(m.sum())        # runs partition the foreground exactly


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2 ** 31 - 1))
def test_quad_iou_symmetry_and_bounds(seed):
    from ctdray.eval import quad_iou

    rng = np.random.default_rng(seed)

    def rand_quad():
        cx, cy = rng.uniform(0, 60, 2)
        w, h = rng.uniform(1, 20, 2)
        a = rng.uniform(0, np.pi)
        base = np.array([[-w, -h], [w, -h], [w, h], [-w, h]]) / 2
        rot = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
        return base @ rot.T + [cx, cy]

    q1, q2 = rand_quad(), rand_quad()
    i12, i21 = quad_iou(q1, q2), quad_iou(q2, q1)
    assert abs(i12 - i21) < 1e-9
    assert -1e-9 <= i12 <= 1 + 1e-9
    assert quad_iou(q1, q1) > 0.999


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2 ** 31 - 1))
def test_resized_mask_window_consistency(seed):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, 256, size=(41, 53)).astype(np.uint8)
    view = geom.ResizedMaskView(src, 80, 64)
    full = view.full()
    y1, y2 = sorted(rng.integers(0, 64, 2))
    x1, x2 = sorted(rng.integers(0, 80, 2))
    assert np.array_equal(view.window(x1, y1, x2, y2), full[y1:y2, x1:x2])


@given(st.integers(1, 40), st.integers(1, 3), st.integers(0, 10**6))
@settings(max_examples=20, deadline=None)
def test_png_roundtrip_property(h, c, seed):
    import numpy as np

    from ctdray.sources.png import decode_png, encode_png

    rng = np.random.default_rng(seed)
    w = int(rng.integers(1, 40))
    shape = (h, w) if c == 1 else (h, w, 3 if c == 2 else 4)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


@given(st.lists(st.floats(-1e6, 1e6), min_size=1, max_size=400),
       st.floats(0.01, 0.99))
@settings(max_examples=10, deadline=None)
def test_exact_quantile_property(ray_session, vals, q):
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ctdray.functions.quantiles import exact_quantiles

    tbl = pa.table({"v": pa.array(vals, pa.float64())})
    out = exact_quantiles(rd.from_arrow(tbl), "v", qs=(q,), n_bins=8,
                          collect_cap=10).to_pandas()
    s = np.sort(np.asarray(vals))
    rank = max(1, math.ceil(q * len(vals)))
    assert out.value.iloc[0] == s[rank - 1]


def test_exact_quantiles_constant_column(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ctdray.functions.quantiles import exact_quantiles

    tbl = pa.table({"v": pa.array([7.5] * 1000, pa.float64())})
    out = exact_quantiles(rd.from_arrow(tbl), "v", qs=(0.25, 0.9),
                          collect_cap=10).to_pandas()
    assert list(out.value) == [7.5, 7.5]


@given(st.lists(st.tuples(st.integers(0, 63), st.integers(1, 64),
                          st.integers(0, 47), st.integers(1, 48)),
                min_size=0, max_size=12),
       st.integers(0, 2 ** 31 - 1))
@settings(max_examples=60, deadline=None)
def test_codec_paint_rects_equals_scan(raw_rects, seed):
    """encode_page_maps(paint_rects=...) must decode identically to the
    scan-based encode for ANY rect set that bounds the nonzeros — here the
    planes are painted exactly inside random rects, so the rect list is a
    valid hint by construction (overlaps and duplicates included).  Rects
    stay inside the (ch, cw) crop: nonzeros in the letterbox pad region
    violate the codec contract in BOTH paths (the dense fallback crops)."""
    import numpy as np

    from ctdray.tensorcodec import decode_page_maps, encode_page_maps

    S, ch, cw = 64, 64, 48
    rng = np.random.default_rng(seed)
    rects = []
    plane0 = np.zeros((S, S), np.float32)
    plane1 = np.zeros((S, S), np.float32)
    for (y0, dy, x0, dx) in raw_rects:
        y1, x1 = min(ch, y0 + dy), min(cw, x0 + dx)
        if y1 <= y0 or x1 <= x0:
            continue
        rects.append((y0, y1, x0, x1))
        # paint PARTIAL coverage inside the rect (zero holes stay exact)
        patch = rng.random((y1 - y0, x1 - x0)).astype(np.float32)
        patch[patch < 0.3] = 0.0
        plane0[y0:y1, x0:x1] = patch
        plane1[y0:y1, x0:x1] = patch * 0.5
    hinted = encode_page_maps((plane0, plane1), ch, cw,
                              paint_rects=(rects, rects))
    scanned = encode_page_maps((plane0, plane1), ch, cw)
    out_h = decode_page_maps(hinted[0], hinted[1], hinted[2], ch, cw,
                             np.float32)
    out_s = decode_page_maps(scanned[0], scanned[1], scanned[2], ch, cw,
                             np.float32)
    assert np.array_equal(out_h, out_s)
    assert np.array_equal(out_h[0], plane0)
    assert np.array_equal(out_h[1], plane1)

"""Pure-numpy geometry kernels.

Every cv2 / shapely / pyclipper / torchvision call the reference makes on the
inference path is re-expressed here in vectorized numpy (SURVEY.md §2.3, §7
step 2).  Semantics-bearing citations point at the reference implementation
each kernel must agree with; the code is written fresh.

These kernels run inside ``map_batches`` UDFs — they must be allocation-light
and loop only over entities (boxes, lines, hull points), never over pixels,
except the run-based connected-component labeler which loops over image rows.
"""
from __future__ import annotations

import math

import numpy as np

# ---------------------------------------------------------------------------
# Axis-aligned box utilities (reference: utils/imgproc_utils.py, yolov5_utils.py)
# ---------------------------------------------------------------------------


def box_intersection_area(a, b) -> float:
    """Intersection area of two xyxy boxes, -1.0 if disjoint.

    Matches the reference's (misnamed) ``union_area``
    (utils/imgproc_utils.py:13-20) including the -1 sentinel.
    """
    x1 = max(a[0], b[0])
    y1 = max(a[1], b[1])
    x2 = min(a[2], b[2])
    y2 = min(a[3], b[3])
    if y2 < y1 or x2 < x1:
        return -1.0
    return float((y2 - y1) * (x2 - x1))


def boxes_intersection_area(boxes: np.ndarray, box) -> np.ndarray:
    """Vectorized ``box_intersection_area`` of many boxes vs one box → (n,)
    with -1.0 where disjoint (used by the line→block assignment loop,
    utils/textblock.py:436-441)."""
    if len(boxes) == 0:
        return np.zeros((0,), dtype=np.float64)
    boxes = np.asarray(boxes, dtype=np.float64)
    x1 = np.maximum(boxes[:, 0], box[0])
    y1 = np.maximum(boxes[:, 1], box[1])
    x2 = np.minimum(boxes[:, 2], box[2])
    y2 = np.minimum(boxes[:, 3], box[3])
    area = (y2 - y1) * (x2 - x1)
    area[(y2 < y1) | (x2 < x1)] = -1.0
    return area


def xywh2xyxy(x: np.ndarray) -> np.ndarray:
    """Center-format (cx,cy,w,h) → corner-format (x1,y1,x2,y2)
    (utils/yolov5_utils.py:220-227)."""
    y = np.copy(x)
    y[:, 0] = x[:, 0] - x[:, 2] / 2
    y[:, 1] = x[:, 1] - x[:, 3] / 2
    y[:, 2] = x[:, 0] + x[:, 2] / 2
    y[:, 3] = x[:, 1] + x[:, 3] / 2
    return y


def xywh2xyxypoly(xywh: np.ndarray, to_int: bool = True) -> np.ndarray:
    """n×4 (x,y,w,h) rects → n×8 corner polygons, corner order
    tl,tr,br,bl (utils/imgproc_utils.py:31-37)."""
    poly = np.tile(xywh[:, [0, 1]], 4).astype(np.float64)
    poly[:, [2, 4]] += xywh[:, [2]]
    poly[:, [5, 7]] += xywh[:, [3]]
    if to_int:
        poly = poly.astype(np.int64)
    return poly


def xyxy2yolo(xyxy, w: int, h: int):
    """Absolute xyxy → normalized cxcywh (utils/imgproc_utils.py:39-51)."""
    if xyxy is None or len(xyxy) == 0:
        return None
    arr = np.asarray(xyxy, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[None, :]
    out = arr.copy()
    out[:, [0, 2]] /= w
    out[:, [1, 3]] /= h
    out[:, [2, 3]] -= out[:, [0, 1]]
    out[:, [0, 1]] += out[:, [2, 3]] / 2
    return out


def yolo_xywh2xyxy(xywh, w: int, h: int, to_int: bool = True):
    """Normalized cxcywh → absolute xyxy (utils/imgproc_utils.py:53-66)."""
    if xywh is None or len(xywh) == 0:
        return None
    arr = np.asarray(xywh, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[None, :]
    out = arr.copy()
    out[:, [0, 2]] *= w
    out[:, [1, 3]] *= h
    out[:, [0, 1]] -= out[:, [2, 3]] / 2
    out[:, [2, 3]] += out[:, [0, 1]]
    if to_int:
        out = out.astype(np.int64)
    return out


def rotate_polygons(center, polygons: np.ndarray, rotation_deg, new_center=None,
                    to_int: bool = True) -> np.ndarray:
    """Rotate n×8 flat polygons about ``center``.

    Keeps the reference's (unusual) sign convention — y' = y·c − x·s,
    x' = y·s + x·c (utils/imgproc_utils.py:68-84) — which `min_rect` and the
    alignment vote depend on.
    """
    if new_center is None:
        new_center = center
    rad = np.deg2rad(rotation_deg)
    s, c = np.sin(rad), np.cos(rad)
    p = np.asarray(polygons, dtype=np.float32).copy()
    p[:, 1::2] -= center[1]
    p[:, ::2] -= center[0]
    out = p.copy()
    out[:, 1::2] = p[:, 1::2] * c - p[:, ::2] * s
    out[:, ::2] = p[:, 1::2] * s + p[:, ::2] * c
    out[:, 1::2] += new_center[1]
    out[:, ::2] += new_center[0]
    if to_int:
        return out.astype(np.int64)
    return out


# ---------------------------------------------------------------------------
# Letterbox (reference: utils/imgproc_utils.py:86-117, inference.py:72-83)
# ---------------------------------------------------------------------------


def letterbox_params(h: int, w: int, new_shape: int = 1024, scaleup: bool = True):
    """Compute the letterbox geometry without touching pixels.

    Returns ``(r, new_w, new_h, dw, dh)``: scale ratio, resized (unpadded)
    size, and the bottom/right padding.  The reference pads only bottom/right
    (utils/imgproc_utils.py:117 — border (0, dh, 0, dw)) so the origin is
    preserved and unmapping is a pure per-axis scale
    (inference.py:147 ``resize_ratio``).
    """
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    r = min(new_shape[0] / h, new_shape[1] / w)
    if not scaleup:
        r = min(r, 1.0)
    new_w, new_h = int(round(w * r)), int(round(h * r))
    dw, dh = new_shape[1] - new_w, new_shape[0] - new_h
    return r, new_w, new_h, int(dw), int(dh)


def resize_bilinear(im: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Vectorized separable bilinear resize (align_corners=False / half-pixel
    centers, the cv2.INTER_LINEAR convention).  2-D (grayscale) or 3-D (HWC).
    Separable float32 implementation — one row-gather pass then one
    column-gather pass — keeps intermediates to 2×image size."""
    h, w = im.shape[:2]
    if (out_h, out_w) == (h, w):
        return im.copy()
    ys = (np.arange(out_h, dtype=np.float32) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w, dtype=np.float32) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0).astype(np.float32)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0).astype(np.float32)[None, :]
    imf = im.astype(np.float32, copy=False)
    if im.ndim == 3:
        wy = wy[..., None]
        wx = wx[..., None]
    rows = imf[y0] * (1 - wy) + imf[y1] * wy          # (out_h, w[, c])
    out = rows[:, x0] * (1 - wx) + rows[:, x1] * wx   # (out_h, out_w[, c])
    if np.issubdtype(im.dtype, np.integer):
        return np.clip(np.round(out), 0, 255).astype(im.dtype)
    return out.astype(im.dtype)


class ResizedMaskView:
    """Deferred bilinear resize of a uint8 mask.

    ``resize_bilinear``'s output is elementwise-independent per output pixel
    (separable gathers + per-pixel weights), so any output window can be
    computed alone with bit-identical values.  ``group_output`` only ever
    samples rectangular window densities (utils/textblock.py:443-447,
    459-464), so the full page-size resize — 25% of per-page CPU — is skipped
    unless a mask sink actually asks for ``full()``.
    """

    def __init__(self, src: np.ndarray, out_w: int, out_h: int,
                 scale255: bool = False):
        """``scale255=True`` accepts the raw FLOAT sigmoid map and applies
        the reference's ``(mask*255).astype(uint8)`` conversion
        (inference.py:85-99) LAZILY per sampled window — most pages never
        sample a density window, so the full-page cast is skipped."""
        # Keep the (possibly strided) crop VIEW: window gathers are
        # stride-aware and value-identical, and most pages never sample a
        # window — an eager contiguous copy here cost ~0.2 ms/page for
        # nothing (the base map outlives the view in every caller).
        self.src = np.asarray(src)
        self._scale255 = scale255
        self._dtype = np.uint8 if scale255 else self.src.dtype
        self.out_w, self.out_h = int(out_w), int(out_h)
        h, w = src.shape[:2]
        self._identity = (out_h, out_w) == (h, w)
        if not self._identity:
            ys = (np.arange(out_h, dtype=np.float32) + 0.5) * (h / out_h) - 0.5
            xs = (np.arange(out_w, dtype=np.float32) + 0.5) * (w / out_w) - 0.5
            self._y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
            self._x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
            self._y1 = np.minimum(self._y0 + 1, h - 1)
            self._x1 = np.minimum(self._x0 + 1, w - 1)
            self._wy = np.clip(ys - self._y0, 0.0, 1.0).astype(np.float32)
            self._wx = np.clip(xs - self._x0, 0.0, 1.0).astype(np.float32)

    @property
    def shape(self):
        return (self.out_h, self.out_w)

    def _u8(self, arr: np.ndarray) -> np.ndarray:
        """Elementwise source-value view in the effective dtype —
        (v*255).astype(uint8) when wrapping a float sigmoid map."""
        return (arr * 255).astype(np.uint8) if self._scale255 else arr

    def window(self, x1, y1, x2, y2) -> np.ndarray:
        """Output pixels [y1:y2, x1:x2] with numpy slicing semantics,
        bit-identical to ``resize_bilinear(u8src, out_w, out_h)[y1:y2,
        x1:x2]`` — only window-local source values are gathered/cast (the
        four corner gathers reproduce the full-row interpolation's float32
        op tree element-for-element)."""
        ya, yb, _ = slice(int(y1), int(y2)).indices(self.out_h)
        xa, xb, _ = slice(int(x1), int(x2)).indices(self.out_w)
        if yb <= ya or xb <= xa:
            return np.zeros((max(0, yb - ya), max(0, xb - xa)),
                            dtype=self._dtype)
        if self._identity:
            return self._u8(self.src[ya:yb, xa:xb])
        y0i, y1i = self._y0[ya:yb], self._y1[ya:yb]
        x0i, x1i = self._x0[xa:xb], self._x1[xa:xb]
        # Gather the two source ROW strips over the window's source-column
        # span (one contiguous column slice each — upscale windows span fewer
        # source columns than output columns), blend rows once, then gather
        # the two needed columns from the blended strip.  Same
        # rows-then-columns float32 op tree as resize_bilinear, element for
        # element, at half the gather volume of four corner gathers.
        xlo = int(x0i[0])
        xhi = int(x1i[-1]) + 1
        r0 = self._u8(self.src[y0i, xlo:xhi]).astype(np.float32)
        r1 = self._u8(self.src[y1i, xlo:xhi]).astype(np.float32)
        wy = self._wy[ya:yb][:, None]
        wx = self._wx[xa:xb][None, :]
        rows = r0 * (1 - wy) + r1 * wy             # == rows[:, xlo:xhi]
        out = rows[:, x0i - xlo] * (1 - wx) + rows[:, x1i - xlo] * wx
        if np.issubdtype(self._dtype, np.integer):
            return np.clip(np.round(out), 0, 255).astype(self._dtype)
        return out.astype(self._dtype)

    def density(self, x1, y1, x2, y2) -> float:
        """mean(window)/255; NaN for an empty window (the reference's numpy
        empty-slice semantics, utils/textblock.py:443-447)."""
        win = self.window(x1, y1, x2, y2)
        if win.size == 0:
            return float("nan")
        return float(win.mean()) / 255.0

    def full(self) -> np.ndarray:
        u8 = self._u8(self.src)
        return u8.copy() if self._identity \
            else resize_bilinear(u8, self.out_w, self.out_h)


def homography_4pt(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Exact 3×3 homography mapping 4 source points to 4 destination points
    (the determined case of cv2.findHomography — with exactly 4
    correspondences RANSAC reduces to the direct solution,
    utils/textblock.py:184,190)."""
    src = np.asarray(src, dtype=np.float64).reshape(4, 2)
    dst = np.asarray(dst, dtype=np.float64).reshape(4, 2)
    a = np.zeros((8, 8))
    b = np.zeros(8)
    for i in range(4):
        x, y = src[i]
        u, v = dst[i]
        a[2 * i] = [x, y, 1, 0, 0, 0, -u * x, -u * y]
        a[2 * i + 1] = [0, 0, 0, x, y, 1, -v * x, -v * y]
        b[2 * i] = u
        b[2 * i + 1] = v
    h = np.linalg.solve(a, b)
    return np.append(h, 1.0).reshape(3, 3)


def warp_perspective(img: np.ndarray, m: np.ndarray, out_w: int,
                     out_h: int) -> np.ndarray:
    """Inverse-mapped bilinear perspective warp (cv2.warpPerspective
    semantics: constant zero border)."""
    minv = np.linalg.inv(m)
    ys, xs = np.mgrid[0:out_h, 0:out_w].astype(np.float64)
    denom = minv[2, 0] * xs + minv[2, 1] * ys + minv[2, 2]
    sx = (minv[0, 0] * xs + minv[0, 1] * ys + minv[0, 2]) / denom
    sy = (minv[1, 0] * xs + minv[1, 1] * ys + minv[1, 2]) / denom
    h, w = img.shape[:2]
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx = sx - x0
    fy = sy - y0
    valid = (x0 >= -1) & (x0 < w) & (y0 >= -1) & (y0 < h)
    x0c = np.clip(x0, 0, w - 1)
    x1c = np.clip(x0 + 1, 0, w - 1)
    y0c = np.clip(y0, 0, h - 1)
    y1c = np.clip(y0 + 1, 0, h - 1)
    imf = img.astype(np.float64, copy=False)
    out = (imf[y0c, x0c] * (1 - fx) * (1 - fy) + imf[y0c, x1c] * fx * (1 - fy)
           + imf[y1c, x0c] * (1 - fx) * fy + imf[y1c, x1c] * fx * fy)
    out[~valid] = 0
    if np.issubdtype(img.dtype, np.integer):
        return np.clip(np.round(out), 0, 255).astype(img.dtype)
    return out.astype(img.dtype)


def letterbox_image(im: np.ndarray, new_shape: int = 1024, scaleup: bool = True):
    """Aspect-preserving resize + bottom/right zero-pad
    (utils/imgproc_utils.py:86-117 with auto=False, stride honored by caller
    passing a stride-multiple ``new_shape``).  Returns (img, r, (dw, dh))."""
    h, w = im.shape[:2]
    r, new_w, new_h, dw, dh = letterbox_params(h, w, new_shape, scaleup)
    out = resize_bilinear(im, new_w, new_h)
    pad = [(0, dh), (0, dw)] + ([(0, 0)] if im.ndim == 3 else [])
    out = np.pad(out, pad, mode="constant")
    return out, r, (dw, dh)


# ---------------------------------------------------------------------------
# IoU + NMS (reference: utils/yolov5_utils.py:100-218)
# ---------------------------------------------------------------------------


def box_iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU of two xyxy box sets → (n, m)
    (utils/yolov5_utils.py:100-122)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = np.clip(rb - lt, 0, None).prod(axis=2)
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def nms_boxes(boxes: np.ndarray, scores: np.ndarray, iou_thres: float) -> np.ndarray:
    """Greedy NMS → kept indices sorted by descending score (the
    torchvision.ops.nms contract the reference relies on,
    utils/yolov5_utils.py:203)."""
    n = len(boxes)
    if n == 0:
        return np.zeros((0,), dtype=np.int64)
    order = np.argsort(-scores, kind="stable")
    boxes = np.asarray(boxes, dtype=np.float64)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1) * (y2 - y1)
    keep = []
    suppressed = np.zeros(n, dtype=bool)
    for idx in order:
        if suppressed[idx]:
            continue
        keep.append(idx)
        xx1 = np.maximum(x1[idx], x1[order])
        yy1 = np.maximum(y1[idx], y1[order])
        xx2 = np.minimum(x2[idx], x2[order])
        yy2 = np.minimum(y2[idx], y2[order])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        iou = inter / (areas[idx] + areas[order] - inter)
        suppressed[order[iou > iou_thres]] = True
    return np.array(keep, dtype=np.int64)


def non_max_suppression(pred: np.ndarray, conf_thres: float = 0.4,
                        iou_thres: float = 0.35, max_det: int = 300) -> np.ndarray:
    """YOLO-style NMS on one image's raw predictions (N, 5+nc) → (n, 6)
    ``[x1,y1,x2,y2,conf,cls]``.

    Semantics match utils/yolov5_utils.py:124-218 (single image, best-class
    path): objectness gate, conf = obj·cls, per-class box offset of 4096 px so
    one class-agnostic NMS is per-class, ≤30000 in / ≤``max_det`` out.
    """
    if pred.ndim == 3:
        pred = pred[0]
    max_wh, max_nms = 4096, 30000
    x = pred[pred[:, 4] > conf_thres]
    if x.shape[0] == 0:
        return np.zeros((0, 6), dtype=np.float64)
    x = x.astype(np.float64, copy=True)
    x[:, 5:] *= x[:, 4:5]
    box = xywh2xyxy(x[:, :4])
    cls = np.argmax(x[:, 5:], axis=1)
    conf = x[np.arange(len(x)), 5 + cls]
    m = conf > conf_thres
    box, conf, cls = box[m], conf[m], cls[m]
    if len(box) == 0:
        return np.zeros((0, 6), dtype=np.float64)
    if len(box) > max_nms:
        top = np.argsort(-conf, kind="stable")[:max_nms]
        box, conf, cls = box[top], conf[top], cls[top]
    offset_boxes = box + (cls[:, None] * max_wh)
    keep = nms_boxes(offset_boxes, conf, iou_thres)[:max_det]
    out = np.concatenate(
        [box[keep], conf[keep, None], cls[keep, None].astype(np.float64)], axis=1
    )
    return out


# ---------------------------------------------------------------------------
# Convex hull + min-area rect (replaces cv2.minAreaRect/boxPoints,
# utils/db_utils.py:176-195)
# ---------------------------------------------------------------------------


def _hull_chain(points: list) -> list:
    """Strict half-hull of lexicographically sorted point tuples — the
    classic sequential monotone-chain stack (pop while the triple is
    non-left-turning, cross ≤ 0).  Scalar on purpose: the extraction path
    calls this on ~20-120 boundary points per text component, where the
    Python stack loop beats vectorized elimination passes ~4× (small-array
    numpy dispatch dominates)."""
    stack: list = []
    for px, py in points:
        while len(stack) >= 2:
            ox, oy = stack[-2]
            ax, ay = stack[-1]
            if (ax - ox) * (py - oy) - (ay - oy) * (px - ox) <= 0:
                stack.pop()
            else:
                break
        stack.append((px, py))
    return stack


def convex_hull(pts: np.ndarray) -> np.ndarray:
    """Monotone-chain hull (strict: collinear points dropped) → hull vertices
    in CCW order (k, 2) float64."""
    pts = np.asarray(pts, dtype=np.float64)
    # sorted(set(...)) == lexicographic (x, y) sort + exact-duplicate drop —
    # the same rows and order as np.unique(axis=0) without its
    # structured-view sort overhead.
    uniq = sorted(set(map(tuple, pts.tolist())))
    if len(uniq) <= 2:
        return np.asarray(uniq, dtype=np.float64).reshape(-1, 2)
    lower = _hull_chain(uniq)
    upper = _hull_chain(uniq[::-1])
    return np.asarray(lower[:-1] + upper[:-1], dtype=np.float64)


def min_area_rect(pts: np.ndarray):
    """Minimum-area enclosing rectangle via rotating calipers over hull edges.

    Returns ``(corners (4,2) float64, (w, h))``.  Equivalent to
    cv2.minAreaRect + cv2.boxPoints (consumed by get_mini_boxes,
    utils/db_utils.py:176-195); corner order is normalized afterwards by
    :func:`order_rect_corners` so the raw order here is irrelevant.
    """
    hull = convex_hull(pts)
    k = len(hull)
    if k == 0:
        return np.zeros((4, 2)), (0.0, 0.0)
    if k == 1:
        c = np.tile(hull[0], (4, 1))
        return c, (0.0, 0.0)
    if k == 2:
        d = hull[1] - hull[0]
        corners = np.array([hull[0], hull[1], hull[1], hull[0]], dtype=np.float64)
        return corners, (float(np.hypot(*d)), 0.0)
    edges = _next_verts(hull) - hull
    ang = np.arctan2(edges[:, 1], edges[:, 0])
    # sorted unique without np.unique's dispatch overhead (same values/order)
    cand = np.sort(np.mod(ang, np.pi / 2))
    if len(cand) > 1:
        cand = cand[np.concatenate(([True], np.diff(cand) > 0))]
    # All candidate angles projected in one vectorized block: px/py are
    # computed with the same multiply/add order as the per-angle
    # ``hull @ [[c, s], [-s, c]].T`` loop, so values (and the
    # first-strict-minimum tie-break, via argmin) are bit-identical to it.
    cs, sn = np.cos(cand), np.sin(cand)
    hx, hy = hull[:, 0], hull[:, 1]
    px = cs[:, None] * hx[None, :] + sn[:, None] * hy[None, :]
    py = (-sn)[:, None] * hx[None, :] + cs[:, None] * hy[None, :]
    mnx, mxx = px.min(axis=1), px.max(axis=1)
    mny, mxy = py.min(axis=1), py.max(axis=1)
    areas = (mxx - mnx) * (mxy - mny)
    i = int(np.argmin(areas))
    a = cand[i]
    mn = np.array([mnx[i], mny[i]])
    mx = np.array([mxx[i], mxy[i]])
    c, s = np.cos(a), np.sin(a)
    rot_inv = np.array([[c, -s], [s, c]])
    rect = np.array(
        [[mn[0], mn[1]], [mx[0], mn[1]], [mx[0], mx[1]], [mn[0], mx[1]]]
    )
    corners = rect @ rot_inv.T
    return corners, (float(mx[0] - mn[0]), float(mx[1] - mn[1]))


def order_rect_corners(corners: np.ndarray, wh) -> tuple[np.ndarray, float]:
    """Normalize 4 rect corners to [tl, tr, br, bl] and return
    ``(box (4,2), sside=min(w,h))`` — the get_mini_boxes contract
    (utils/db_utils.py:176-195): sort by x; among the left pair the smaller-y
    point leads, among the right pair the smaller-y point is 'tr'."""
    pts = sorted(corners.tolist(), key=lambda p: p[0])
    if pts[1][1] > pts[0][1]:
        i1, i4 = 0, 1
    else:
        i1, i4 = 1, 0
    if pts[3][1] > pts[2][1]:
        i2, i3 = 2, 3
    else:
        i2, i3 = 3, 2
    box = np.array([pts[i1], pts[i2], pts[i3], pts[i4]], dtype=np.float64)
    return box, float(min(wh))


def _next_verts(p: np.ndarray) -> np.ndarray:
    """np.roll(p, -1, axis=0) for small vertex arrays without the axis
    machinery overhead (bit-identical output)."""
    return np.concatenate((p[1:], p[:1]))


def polygon_area(poly: np.ndarray) -> float:
    """Shoelace area (absolute)."""
    p = np.asarray(poly, dtype=np.float64)
    x, y = p[:, 0], p[:, 1]
    xn, yn = _next_verts(x), _next_verts(y)
    return abs(float(np.dot(x, yn) - np.dot(y, xn))) / 2.0


def polygon_perimeter(poly: np.ndarray) -> float:
    p = np.asarray(poly, dtype=np.float64)
    e = _next_verts(p) - p
    return float(np.sqrt((e * e).sum(axis=1)).sum())


def unclip_rect(box: np.ndarray, unclip_ratio: float = 1.5) -> np.ndarray:
    """DBNet 'unclip': offset the rect outward by d = area·ratio / perimeter.

    The reference offsets with a round join and immediately takes the
    min-area-rect of the result (utils/db_utils.py:151-174); for a rectangle
    that is exactly the rectangle grown by d on every side, so we grow
    analytically: each corner moves by d along both of its adjacent outward
    edge normals.
    """
    b = np.asarray(box, dtype=np.float64)
    # Scalar math throughout: the input is always exactly 4 corners, and at
    # ~13 components/page this call is hot — small-array numpy dispatch
    # (stack/where/mean on shape-(4,2)) measured ~10× the arithmetic cost.
    pts = b.tolist()
    (x0, y0), (x1, y1), (x2, y2), (x3, y3) = pts
    area = abs((x0 * y1 + x1 * y2 + x2 * y3 + x3 * y0)
               - (y0 * x1 + y1 * x2 + y2 * x3 + y3 * x0)) / 2.0
    perim = (math.sqrt((x1 - x0) ** 2 + (y1 - y0) ** 2)
             + math.sqrt((x2 - x1) ** 2 + (y2 - y1) ** 2)
             + math.sqrt((x3 - x2) ** 2 + (y3 - y2) ** 2)
             + math.sqrt((x0 - x3) ** 2 + (y0 - y3) ** 2))
    if perim <= 0:
        return b.copy()
    d = area * unclip_ratio / perim
    cx = (x0 + x1 + x2 + x3) / 4.0
    cy = (y0 + y1 + y2 + y3) / 4.0
    out = []
    for i in range(4):
        px, py = pts[i]
        qx, qy = pts[i - 1]            # previous vertex
        rx, ry = pts[(i + 1) % 4]      # next vertex
        # Outward normal of each adjacent edge = edge direction rotated away
        # from the polygon interior.
        n1x, n1y = py - qy, qx - px
        n2x, n2y = ry - py, px - rx
        l1 = math.sqrt(n1x * n1x + n1y * n1y)
        l2 = math.sqrt(n2x * n2x + n2y * n2y)
        if l1 > 0:
            n1x /= l1
            n1y /= l1
        if l2 > 0:
            n2x /= l2
            n2y /= l2
        sx, sy = (n1x + n2x) * d, (n1y + n2y) * d
        ax, ay = px + sx, py + sy
        bx, by = px - sx, py - sy
        # Pick the candidate farther from the center (outward).
        if ((ax - cx) ** 2 + (ay - cy) ** 2) >= ((bx - cx) ** 2 + (by - cy) ** 2):
            out.append((ax, ay))
        else:
            out.append((bx, by))
    return np.array(out, dtype=np.float64)


# ---------------------------------------------------------------------------
# Convex quad intersection (replaces shapely Polygon.intersects,
# utils/textblock.py:355-356, 400-402)
# ---------------------------------------------------------------------------


def quads_intersect(q1, q2) -> bool:
    """Separating-axis test for two convex quads; touching counts as
    intersecting (the shapely ``intersects`` contract)."""
    q1 = np.asarray(q1, dtype=np.float64).reshape(4, 2)
    q2 = np.asarray(q2, dtype=np.float64).reshape(4, 2)
    e = np.concatenate((_next_verts(q1) - q1, _next_verts(q2) - q2))
    axes = np.stack([-e[:, 1], e[:, 0]], axis=1)          # (8, 2)
    axes = axes[(axes != 0).any(axis=1)]
    if not len(axes):
        return True
    p1 = q1 @ axes.T                                       # (4, n_axes)
    p2 = q2 @ axes.T
    sep = (p1.max(axis=0) < p2.min(axis=0)) | (p2.max(axis=0) < p1.min(axis=0))
    return not bool(sep.any())


# ---------------------------------------------------------------------------
# Convex polygon rasterization (replaces cv2.fillPoly on the score path,
# utils/db_utils.py:197-211, and the surrogate's map synthesis)
# ---------------------------------------------------------------------------


def _axis_aligned_quad(p: np.ndarray) -> bool:
    """True iff the 4-gon is a NON-degenerate axis-aligned rectangle: four
    axis-parallel edges, none zero-length.  Closure then forces H/V
    alternation, i.e. vertices (xa,ya),(xb,ya),(xb,yb),(xa,yb) — so the
    half-plane AND collapses to the bbox test exactly (each horizontal
    edge's cross≥0 is ys≥/≤ its y; vertical likewise; closed boundaries).
    Degenerate quads (repeated vertices / zero area) keep the generic path,
    whose zero-length edges drop constraints — semantics preserved
    bit-exactly."""
    if len(p) != 4:
        return False
    return _axis_aligned_pts(p.tolist())


def _axis_aligned_pts(pts: list) -> bool:
    """List-form body of :func:`_axis_aligned_quad` (len-4 pre-checked by
    callers that already hold the vertex list)."""
    (ax, ay), (bx, by), (cx, cy), (dx, dy) = pts

    def edge_ok(x0, y0, x1, y1):
        sx, sy = x0 == x1, y0 == y1
        return (sx or sy) and not (sx and sy)

    return edge_ok(ax, ay, bx, by) and edge_ok(bx, by, cx, cy) \
        and edge_ok(cx, cy, dx, dy) and edge_ok(dx, dy, ax, ay)


def fill_convex_poly(canvas: np.ndarray, poly: np.ndarray, value):
    """Fill a convex polygon into ``canvas`` in place (half-plane tests over
    the polygon's clipped bbox only — no full-image work).  Axis-aligned
    quads (the dominant case on rendered fixture pages) fill by direct
    slice assignment — bit-identical, no mask materialized.

    Returns the clipped bbox ``(y0, y1, x0, x1)`` that bounds every painted
    pixel (``None`` if nothing was painted) — callers that reuse canvases
    zero exactly these regions to restore a pristine buffer
    (SurrogateDetector's dirty-rect map reuse)."""
    h, w = canvas.shape[:2]
    p = np.asarray(poly, dtype=np.float64).reshape(-1, 2)
    # Scalar bbox math over the vertex list: this runs ~30×/page on 4-8
    # vertices, where four numpy reductions per call cost more than the
    # whole fill (same floats, bit-identical bounds).
    pts = p.tolist()
    xmin = min(q[0] for q in pts)
    xmax = max(q[0] for q in pts)
    ymin = min(q[1] for q in pts)
    ymax = max(q[1] for q in pts)
    x0 = max(int(math.floor(xmin)), 0)
    x1 = min(int(math.ceil(xmax)) + 1, w)
    y0 = max(int(math.floor(ymin)), 0)
    y1 = min(int(math.ceil(ymax)) + 1, h)
    if x1 <= x0 or y1 <= y0:
        return None
    if len(pts) == 4 and _axis_aligned_pts(pts):
        # pixel x inside ⟺ xmin ≤ x ≤ xmax ⟺ x ∈ [ceil(xmin), floor(xmax)]
        ix0 = max(int(math.ceil(xmin)), x0)
        ix1 = min(int(math.floor(xmax)) + 1, x1)
        iy0 = max(int(math.ceil(ymin)), y0)
        iy1 = min(int(math.floor(ymax)) + 1, y1)
        if ix1 > ix0 and iy1 > iy0:
            canvas[iy0:iy1, ix0:ix1] = value
            return (iy0, iy1, ix0, ix1)
        return None
    inside = convex_poly_mask(p, y0, y1, x0, x1)
    region = canvas[y0:y1, x0:x1]
    region[inside] = value
    return (y0, y1, x0, x1)


def convex_poly_mask(poly: np.ndarray, y0: int, y1: int, x0: int, x1: int) -> np.ndarray:
    """Boolean inside-mask of a convex polygon over the pixel grid
    [y0:y1, x0:x1] (pixel centers at integer coordinates, matching
    cv2.fillPoly's integer-grid behavior closely enough for solid regions)."""
    p = np.asarray(poly, dtype=np.float64).reshape(-1, 2)
    # Ensure consistent winding via signed area — kept as the original
    # np.dot expression so the float association (and thus the sign on
    # near-degenerate polys) is unchanged; everything below runs on the
    # python vertex list, where numpy's per-op dispatch dominates the
    # actual 4-8-element arithmetic.
    x, y = p[:, 0], p[:, 1]
    signed = float(np.dot(x, _next_verts(y)) - np.dot(y, _next_verts(x))) / 2.0
    pl = p.tolist()
    k = len(pl)
    if signed < 0:
        pl = pl[::-1]
    ys = np.arange(y0, y1, dtype=np.float64)[:, None]
    xs = np.arange(x0, x1, dtype=np.float64)[None, :]
    if k == 4 and _axis_aligned_pts(pl):
        pxs = [q[0] for q in pl]
        pys = [q[1] for q in pl]
        return ((ys >= min(pys)) & (ys <= max(pys))) \
            & ((xs >= min(pxs)) & (xs <= max(pxs)))
    inside = np.ones((y1 - y0, x1 - x0), dtype=bool)
    for i in range(k):
        ax, ay = pl[i]
        bx, by = pl[(i + 1) % k]
        # CCW winding: interior is on the left → cross((b-a),(pt-a)) >= 0.
        # The cross is separable, cross = U(y) − V(x) with each factor
        # computed exactly as the 2-D broadcast would, and u−v ≥ 0 ⟺ u ≥ v
        # for finite floats — so one H×W COMPARISON replaces the two H×W
        # float passes + compare, decision-identical per pixel.
        u = (bx - ax) * (ys - ay)
        v = (by - ay) * (xs - ax)
        inside &= u >= v
        if not inside.any():
            break
    return inside


def poly_mean_score(score_map: np.ndarray, poly: np.ndarray) -> float:
    """Mean of ``score_map`` inside the polygon's filled region, clipped to the
    map (the box_score_fast contract, utils/db_utils.py:197-211)."""
    h, w = score_map.shape
    p = np.asarray(poly, dtype=np.float64).reshape(-1, 2)
    x0 = int(np.clip(np.floor(p[:, 0].min()), 0, w - 1))
    x1 = int(np.clip(np.ceil(p[:, 0].max()), 0, w - 1)) + 1
    y0 = int(np.clip(np.floor(p[:, 1].min()), 0, h - 1))
    y1 = int(np.clip(np.ceil(p[:, 1].max()), 0, h - 1)) + 1
    inside = convex_poly_mask(p, y0, y1, x0, x1)
    if not inside.any():
        return 0.0
    return float(score_map[y0:y1, x0:x1][inside].mean())


def shrink_poly(poly: np.ndarray, shrink_ratio: float = 0.4) -> np.ndarray:
    """DBNet GT shrink: move every edge inward by
    d = area·(1−r²)/perimeter (utils/db_utils.py:560-566 semantics).  Convex
    polygons only (our quads); implemented as the inward analogue of
    :func:`unclip_rect`."""
    p = np.asarray(poly, dtype=np.float64).reshape(-1, 2)
    k = len(p)
    pts = p.tolist()
    # Scalar math (the hot case is always a quad; generic k kept by the same
    # loop) — small-array numpy dispatch dominated this function's cost.
    area = 0.0
    perim = 0.0
    for i in range(k):
        x0, y0 = pts[i]
        x1, y1 = pts[(i + 1) % k]
        area += x0 * y1 - y0 * x1
        perim += math.sqrt((x1 - x0) ** 2 + (y1 - y0) ** 2)
    area = abs(area) / 2.0
    if perim <= 0:
        return p.copy()
    d = area * (1 - shrink_ratio ** 2) / perim
    cx = sum(q[0] for q in pts) / k
    cy = sum(q[1] for q in pts) / k
    out = []
    for i in range(k):
        px, py = pts[i]
        qx, qy = pts[i - 1]
        rx, ry = pts[(i + 1) % k]
        n1x, n1y = py - qy, qx - px
        n2x, n2y = ry - py, px - rx
        l1 = math.sqrt(n1x * n1x + n1y * n1y)
        l2 = math.sqrt(n2x * n2x + n2y * n2y)
        if l1 > 0:
            n1x /= l1
            n1y /= l1
        if l2 > 0:
            n2x /= l2
            n2y /= l2
        sx, sy = (n1x + n2x) * d, (n1y + n2y) * d
        ax, ay = px + sx, py + sy
        bx, by = px - sx, py - sy
        # Pick the candidate closer to the center (inward).
        if ((ax - cx) ** 2 + (ay - cy) ** 2) <= ((bx - cx) ** 2 + (by - cy) ** 2):
            out.append((ax, ay))
        else:
            out.append((bx, by))
    return np.array(out, dtype=np.float64)


# ---------------------------------------------------------------------------
# Connected components (replaces cv2.findContours/connectedComponents on the
# extraction path, utils/db_utils.py:138 and utils/textmask.py:84,97,141)
# ---------------------------------------------------------------------------


class _UnionFind:
    __slots__ = ("parent",)

    def __init__(self):
        self.parent: list[int] = []

    def make(self) -> int:
        self.parent.append(len(self.parent))
        return len(self.parent) - 1

    def find(self, x: int) -> int:
        p = self.parent
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:
            p[x], x = root, p[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            if ra < rb:
                self.parent[rb] = ra
            else:
                self.parent[ra] = rb


def _image_runs(mask: np.ndarray):
    """All horizontal foreground runs of a boolean image, extracted in one
    vectorized pass.  Returns ``(rows, starts, ends)`` int64 arrays, runs in
    row-major scan order; starts/ends are [start, end) column indices."""
    h, w = mask.shape
    padded = np.zeros((h, w + 2), dtype=np.int8)
    padded[:, 1:-1] = mask
    diff = np.diff(padded.reshape(-1))
    starts_flat = np.flatnonzero(diff == 1)
    ends_flat = np.flatnonzero(diff == -1)
    rows = starts_flat // (w + 2)
    starts = starts_flat - rows * (w + 2)
    ends = ends_flat - rows * (w + 2)
    return rows, starts, ends


def connected_component_runs(mask: np.ndarray, connectivity: int = 8):
    """Run-based union-find connected-component labeling.

    Returns a list of components in first-encounter scan order; each is a
    ``(rows, starts, ends)`` triple of int64 arrays (horizontal runs).  Only
    rows containing foreground cost anything; per-row work is a short
    two-pointer merge over that row's runs.

    This is the engine's stand-in for cv2.findContours → per-contour
    processing: for solid regions the min-area-rect / mean score over a
    component's pixels equal those over its filled outer contour
    (utils/db_utils.py:123-166 parity; deviation documented in
    ctdray.represent).
    """
    return connected_component_runs_ex(mask, connectivity)[0]


def connected_component_runs_ex(mask: np.ndarray, connectivity: int = 8):
    """:func:`connected_component_runs` plus a per-component EXTENTS table:
    ``(comps, extents)`` with ``extents`` int64 (k, 7) rows
    ``[r0, r1, smin, smax, emin, emax, npix]`` (row range, start/end column
    bounds over the runs, pixel count).  The extents come from a handful of
    segmented ``reduceat`` passes over the component-sorted run arrays —
    consumers like the DB representer would otherwise pay ~10 small-array
    numpy reductions PER component, which dominated its loop."""
    m = np.ascontiguousarray(mask.astype(bool, copy=False))
    rows, starts, ends = _image_runs(m)
    n_runs = len(rows)
    if n_runs == 0:
        return [], np.zeros((0, 7), dtype=np.int64)
    # Python lists for the sequential merge: numpy SCALAR indexing inside
    # the two-pointer loop was the dominant cost, not the merge logic.
    rows_l = rows.tolist()
    starts_l = starts.tolist()
    ends_l = ends.tolist()
    labels: list[int] = [0] * n_runs
    uf = _UnionFind()
    tol = 1 if connectivity == 8 else 0
    # Row boundaries in the run arrays.
    row_breaks = np.flatnonzero(np.diff(rows)) + 1
    bounds = np.concatenate([[0], row_breaks, [n_runs]]).tolist()
    prev_lo = prev_hi = 0
    prev_row = -2
    for bi in range(len(bounds) - 1):
        lo, hi = bounds[bi], bounds[bi + 1]
        row = rows_l[lo]
        if row != prev_row + 1:
            prev_lo = prev_hi = lo  # no adjacent previous row → empty window
        j = prev_lo
        for i in range(lo, hi):
            s, e = starts_l[i], ends_l[i]
            lab = -1
            while j < prev_hi and ends_l[j] + tol <= s:
                j += 1
            jj = j
            while jj < prev_hi and starts_l[jj] < e + tol:
                plab = labels[jj]
                if lab == -1:
                    lab = plab
                else:
                    uf.union(lab, plab)
                jj += 1
            if lab == -1:
                lab = uf.make()
            labels[i] = lab
        prev_lo, prev_hi, prev_row = lo, hi, row
    # Resolve roots → component ids in first-encounter order, then gather
    # per-component run slices via ONE stable argsort (scan order within a
    # component is preserved — the run arrays are already in scan order).
    comp_of_root: dict[int, int] = {}
    cids = np.empty(n_runs, dtype=np.int64)
    find = uf.find
    for i in range(n_runs):
        root = find(labels[i])
        cid = comp_of_root.get(root)
        if cid is None:
            cid = len(comp_of_root)
            comp_of_root[root] = cid
        cids[i] = cid
    k = len(comp_of_root)
    order = np.argsort(cids, kind="stable")
    rows_s = rows[order]
    starts_s = starts[order]
    ends_s = ends[order]
    seg = np.searchsorted(cids[order], np.arange(k))
    bounds = np.append(seg, n_runs)
    out = [(rows_s[a:b], starts_s[a:b], ends_s[a:b])
           for a, b in zip(bounds[:-1], bounds[1:])]
    ext = np.empty((k, 7), dtype=np.int64)
    ext[:, 0] = rows_s[seg]                        # r0: first run = min row
    ext[:, 1] = rows_s[bounds[1:] - 1]             # r1: last run = max row
    ext[:, 2] = np.minimum.reduceat(starts_s, seg)
    ext[:, 3] = np.maximum.reduceat(starts_s, seg)
    ext[:, 4] = np.minimum.reduceat(ends_s, seg)
    ext[:, 5] = np.maximum.reduceat(ends_s, seg)
    ext[:, 6] = np.add.reduceat(ends_s - starts_s, seg)
    return out, ext


def connected_components(mask: np.ndarray, connectivity: int = 8):
    """Label-image view over :func:`connected_component_runs`:
    ``(labels int32 (h,w), n)`` with 0 = background, ids 1..n in
    first-encounter scan order (the cv2.connectedComponents contract used by
    the mask-refine stage, utils/textmask.py:84,97,141)."""
    comps = connected_component_runs(mask, connectivity)
    labels = np.zeros(mask.shape, dtype=np.int32)
    for cid, (rows, starts, ends) in enumerate(comps, start=1):
        for r, s, e in zip(rows, starts, ends):
            labels[r, s:e] = cid
    return labels, len(comps)


def run_boundary_points(rows: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Per-run extreme pixels (x,y) — the only points that can lie on the
    convex hull of a run-encoded region.  ≤ 2 points per run instead of the
    full pixel set (hull/min-rect over these equals hull over all pixels)."""
    left = np.stack([starts, rows], axis=1)
    right = np.stack([ends - 1, rows], axis=1)
    return np.concatenate([left, right], axis=0)


def min_area_rect_runs(rows: np.ndarray, starts: np.ndarray,
                       ends: np.ndarray):
    """:func:`min_area_rect` over a run-encoded component, with an
    axis-aligned RECTANGLE fast path: when every run shares one [start, end)
    column interval over a contiguous row range — ~80% of detection-map
    components, whose quads render axis-aligned — the hull is the four
    corners, the only caliper angle candidate is exactly 0 (every hull edge
    is axis-parallel, cos=1/sin=0 exact), and the rotation is the identity,
    so the calipers result IS the bounding box.  Degenerate extents (single
    row / single column) fall through to the general path, whose k≤2 hull
    branches shape them differently."""
    s0 = starts[0]
    if bool((starts == s0).all()):
        e0 = ends[0]
        if bool((ends == e0).all()) and \
                int(rows[-1]) - int(rows[0]) + 1 == len(rows):
            x0, x1 = float(s0), float(e0 - 1)
            y0, y1 = float(rows[0]), float(rows[-1])
            if x1 > x0 and y1 > y0:
                corners = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]],
                                   dtype=np.float64)
                return corners, (x1 - x0, y1 - y0)
    return min_area_rect(run_boundary_points(rows, starts, ends))


def runs_pixel_count(starts: np.ndarray, ends: np.ndarray) -> int:
    return int((ends - starts).sum())


def row_cumsum(img: np.ndarray) -> np.ndarray:
    """Per-row prefix sums of an image (compute once per page, share across
    components)."""
    return np.cumsum(img, axis=1, dtype=np.float64)


def runs_values_sum(csum: np.ndarray, rows: np.ndarray, starts: np.ndarray,
                    ends: np.ndarray) -> float:
    """Sum of the original image over a run-encoded region, given its
    :func:`row_cumsum` — no per-pixel Python."""
    left = np.where(starts > 0, csum[rows, np.maximum(starts - 1, 0)], 0.0)
    return float((csum[rows, ends - 1] - left).sum())


# ---------------------------------------------------------------------------
# Otsu threshold (replaces cv2.threshold(..., THRESH_OTSU),
# utils/textmask.py:31-38)
# ---------------------------------------------------------------------------


def otsu_threshold(gray: np.ndarray) -> int:
    """Between-class-variance-maximizing threshold of a uint8 image."""
    hist = np.bincount(gray.reshape(-1), minlength=256).astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 0
    levels = np.arange(256, dtype=np.float64)
    w0 = np.cumsum(hist)
    w1 = total - w0
    sum0 = np.cumsum(hist * levels)
    total_sum = sum0[-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        mu0 = sum0 / w0
        mu1 = (total_sum - sum0) / w1
        var = w0 * w1 * (mu0 - mu1) ** 2
    var[~np.isfinite(var)] = -1
    return int(np.argmax(var))


def expand_textwindow(img_size, xyxy, expand_r: int = 8, shrink: bool = False):
    """Pad a block bbox by (max(h,w)·0.25 + min(h,w)·0.75)/expand_r, clipped
    to the image (utils/imgproc_utils.py:151-161)."""
    im_h, im_w = img_size[:2]
    x1, y1, x2, y2 = xyxy
    w, h = x2 - x1, y2 - y1
    pad = int(round((max(h, w) * 0.25 + min(h, w) * 0.75) / expand_r))
    if shrink:
        pad = -pad
    return [max(0, x1 - pad), max(0, y1 - pad), min(im_w - 1, x2 + pad), min(im_h - 1, y2 + pad)]

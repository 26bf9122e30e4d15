"""Detection-quality evaluation — the reference's DetectionIoUEvaluator +
combine_results (utils/db_utils.py:233-435, SURVEY.md §2.7 AG1-AG3) as a
distributive Ray aggregate.

Per page: greedy 1-1 matching of predicted vs ground-truth quads at
IoU > 0.5 (gt-major scan order, matching the reference's nested loop at
utils/db_utils.py:365-378); polygon IoU via Sutherland-Hodgman convex
clipping (replacing shapely).  Partials ``(gt_care, det_care, det_matched)``
are emitted per page inside ``map_batches`` and summed with
``Dataset.aggregate(Sum(...))`` — the classic combiner shape: raw quads never
shuffle, three ints per page do.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from .geom import polygon_area


def _ccw(poly: np.ndarray) -> np.ndarray:
    p = np.asarray(poly, dtype=np.float64).reshape(-1, 2)
    x, y = p[:, 0], p[:, 1]
    signed = float(np.dot(x, np.concatenate((y[1:], y[:1])))
                   - np.dot(y, np.concatenate((x[1:], x[:1])))) / 2.0
    return p if signed >= 0 else p[::-1]


def clip_convex(subject: np.ndarray, clip: np.ndarray) -> list:
    """Sutherland-Hodgman: clip convex ``subject`` by convex ``clip`` (both
    made CCW); returns the clipped polygon's vertices (possibly empty)."""
    subject = _ccw(subject)
    clip = _ccw(clip)
    out = [tuple(v) for v in subject]
    k = len(clip)
    for i in range(k):
        if not out:
            break
        ax, ay = clip[i]
        bx, by = clip[(i + 1) % k]
        ex, ey = bx - ax, by - ay
        new = []
        n = len(out)
        for j in range(n):
            px, py = out[j]
            qx, qy = out[(j + 1) % n]
            side_p = ex * (py - ay) - ey * (px - ax) >= 0
            side_q = ex * (qy - ay) - ey * (qx - ax) >= 0
            if side_p:
                new.append((px, py))
            if side_p != side_q:
                dp = ex * (py - ay) - ey * (px - ax)
                dq = ex * (qy - ay) - ey * (qx - ax)
                t = dp / (dp - dq)
                new.append((px + t * (qx - px), py + t * (qy - py)))
        out = new
    return out


def quad_iou(a, b) -> float:
    """Polygon IoU of two convex quads (shapely intersection/union parity,
    utils/db_utils.py:241-248)."""
    inter_poly = clip_convex(np.asarray(a), np.asarray(b))
    inter = polygon_area(np.array(inter_poly)) if len(inter_poly) >= 3 else 0.0
    union = polygon_area(np.asarray(a)) + polygon_area(np.asarray(b)) - inter
    return inter / union if union > 0 else 0.0


def evaluate_page(gt_quads, det_quads, iou_constraint: float = 0.5,
                  gt_ignore=None,
                  area_precision_constraint: float = 0.5):
    """Greedy 1-1 match in gt-major order with don't-care filtering
    (utils/db_utils.py:296-381): GT quads flagged ignore leave the care
    count, and a detection whose own-area overlap with any don't-care GT
    exceeds ``area_precision_constraint`` joins the det don't-care set
    (utils/db_utils.py:333-342) — neither side then participates in
    matching.  Returns (gt_care, det_care, det_matched)."""
    n_gt, n_det = len(gt_quads), len(det_quads)
    gt_ignore = list(gt_ignore) if gt_ignore is not None else [False] * n_gt
    gt_dc = {i for i, ig in enumerate(gt_ignore) if ig}
    det_dc: set = set()
    if gt_dc:
        for di, d in enumerate(det_quads):
            d_arr = np.asarray(d)
            d_area = polygon_area(d_arr)
            for gi in gt_dc:
                inter_poly = clip_convex(np.asarray(gt_quads[gi]), d_arr)
                inter = polygon_area(np.array(inter_poly)) \
                    if len(inter_poly) >= 3 else 0.0
                prec = 0.0 if d_area == 0 else inter / d_area
                if prec > area_precision_constraint:
                    det_dc.add(di)
                    break
    gt_matched = [False] * n_gt
    det_matched = [False] * n_det
    matched = 0
    for gi, g in enumerate(gt_quads):
        for di, d in enumerate(det_quads):
            if gt_matched[gi] or det_matched[di] \
                    or gi in gt_dc or di in det_dc:
                continue
            if quad_iou(d, g) > iou_constraint:
                gt_matched[gi] = det_matched[di] = True
                matched += 1
    return n_gt - len(gt_dc), n_det - len(det_dc), matched


def combine_results(gt_care: int, det_care: int, matched: int) -> dict:
    """Micro P/R/F1 from global partial sums (utils/db_utils.py:415-435)."""
    recall = 0.0 if gt_care == 0 else matched / gt_care
    precision = 0.0 if det_care == 0 else matched / det_care
    hmean = 0.0 if recall + precision == 0 else \
        2 * recall * precision / (recall + precision)
    return {"precision": precision, "recall": recall, "hmean": hmean,
            "gt_care": gt_care, "det_care": det_care, "det_matched": matched}


def detection_quality(docs: ray.data.Dataset, cfg=None,
                      backend: str = "surrogate") -> pa.Table:
    """Distributed eval: detect every page, match against the fixture ground
    truth, reduce partial counts with Sum aggregates → one metrics row."""
    from ray.data.aggregate import Sum

    from .config import PipelineConfig
    from .detect_core import detect_page
    from .fixtures import page_ground_truth
    from .sources.media import decode_page
    from .stages.detect import _TASK_DETECTORS
    from .stages.explode import explode_media_spans
    from .surrogate import make_detector

    cfg = cfg or PipelineConfig()

    def page_partials(batch: pa.Table) -> pa.Table:
        key = (backend, cfg.detector)
        det = _TASK_DETECTORS.get(key)
        if det is None:
            det = _TASK_DETECTORS[key] = make_detector(backend, cfg.detector)
        rows = []
        for ref in batch.column("media_ref").to_pylist():
            try:
                img = decode_page(ref)
            except ValueError:
                continue
            blocks, _ = detect_page(det, ref, img.shape[0], img.shape[1],
                                    cfg.detector)
            det_quads = [np.asarray(l).reshape(4, 2)
                         for b in blocks for l in b.lines]
            gt = page_ground_truth(ref)
            gt_quads = [q for b in gt.blocks for q in b.lines]
            # fixture blocks below the detectability threshold are the
            # don't-care regions (AG1 ignore tags, utils/db_utils.py:296-342)
            gt_ignore = [not b.detected for b in gt.blocks for _ in b.lines]
            g, d, m = evaluate_page(gt_quads, det_quads, gt_ignore=gt_ignore)
            rows.append({"gt_care": g, "det_care": d, "det_matched": m})
        if not rows:
            return pa.table({"gt_care": pa.array([], pa.int64()),
                             "det_care": pa.array([], pa.int64()),
                             "det_matched": pa.array([], pa.int64())})
        return pa.Table.from_pylist(rows)

    pages = docs.map_batches(explode_media_spans, batch_format="pyarrow")
    partials = pages.map_batches(page_partials, batch_format="pyarrow",
                                 batch_size=cfg.detect_batch_size)
    agg = partials.aggregate(Sum("gt_care"), Sum("det_care"),
                             Sum("det_matched"))
    res = combine_results(int(agg["sum(gt_care)"]), int(agg["sum(det_care)"]),
                          int(agg["sum(det_matched)"]))
    return pa.Table.from_pylist([res])

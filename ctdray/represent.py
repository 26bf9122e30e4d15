"""DBNet-style shrink-map → scored line quads.

Fresh numpy expression of the reference's SegDetectorRepresenter
(utils/db_utils.py:32-211) used on the inference path
(``boxes_from_bitmap``): binarize channel 0 at ``thresh`` → connected
regions → per region: min-area-rect (sside<2 skip) → region mean score →
unclip by area·ratio/perimeter → min-area-rect again → round/clip to the
destination size.

Deviation (documented): the reference walks cv2.findContours outlines; we
label connected components and use component pixel coordinates.  For solid
regions (all the maps this engine sees — DB shrink maps are filled regions)
the min-area-rect and mean score over the filled outer contour equal those
over the component pixels, so the quads are identical; only the emission
order can differ (cv2 lists contours bottom-up; we scan top-down).  Order is
normalized downstream by the reading-order sort; the oracle shares this
kernel, keeping the span contract exact.
"""
from __future__ import annotations

import numpy as np

from .config import DetectorConfig
from .geom import (
    connected_component_runs_ex,
    min_area_rect,
    order_rect_corners,
    row_cumsum,
    run_boundary_points,
    runs_values_sum,
    unclip_rect,
)


def boxes_from_bitmap(pred: np.ndarray, thresh: float = 0.3,
                      box_thresh_unused: float = 0.6, max_candidates: int = 1000,
                      unclip_ratio: float = 1.5,
                      dest_width: int | None = None, dest_height: int | None = None,
                      active_rows: tuple | None = None):
    """Extract scored quads from one shrink map (H, W) float.

    Returns ``(boxes (k,4,2) int32, scores (k,) float32)`` with k = number of
    candidate regions (capped); regions failing the sside filter keep their
    zero row + zero score exactly like the reference's preallocated output
    (utils/db_utils.py:138-141), to be filtered by the caller's
    ``score > box_thresh`` gate (inference.py:159-161).

    Components are run-length encoded; min-rect uses only per-run boundary
    pixels and the mean score uses per-row prefix sums — per-region work is
    O(region rows), not O(region pixels).
    """
    height, width = pred.shape
    dest_width = width if dest_width is None else dest_width
    dest_height = height if dest_height is None else dest_height
    # ``active_rows`` (y0, y1): a row band GUARANTEED to bound every
    # above-threshold pixel (detect_core passes the detector's paint-rect
    # band when the backend exposes one) — the threshold compare and the
    # CC run extraction then touch only the band instead of the full map,
    # with all row coordinates shifted back to map space below.
    if active_rows is not None:
        ay0 = max(0, int(active_rows[0]))
        ay1 = min(height, int(active_rows[1]))
        if ay1 <= ay0:
            return (np.zeros((0, 4, 2), dtype=np.int32),
                    np.zeros((0,), dtype=np.float32))
        bitmap = pred[ay0:ay1] > thresh
    else:
        ay0 = 0
        bitmap = pred > thresh
    comps, exts = connected_component_runs_ex(bitmap, connectivity=8)
    comps = comps[:max_candidates]
    if ay0:
        comps = [(rows + ay0, starts, ends) for (rows, starts, ends) in comps]
        exts = exts.copy()
        exts[:, 0] += ay0
        exts[:, 1] += ay0
    k = len(comps)
    boxes = np.zeros((k, 4, 2), dtype=np.int32)
    scores = np.zeros((k,), dtype=np.float32)
    ext_l = exts[:k].tolist()          # python ints: no per-field np scalars
    for i, (rows, starts, ends) in enumerate(comps):
        r0, r1, smin, smax, emin, emax, npix = ext_l[i]
        if smin == smax and emin == emax and len(rows) == r1 - r0 + 1 \
                and emin - 1 > smin and r1 > r0:
            # Axis-aligned rectangle (~80% of detection-map components):
            # the calipers' only angle candidate is exactly 0, so the
            # min-area rect IS the bounds box (geom.min_area_rect_runs).
            x0f, x1f = float(smin), float(emin - 1)
            y0f, y1f = float(r0), float(r1)
            corners = np.array([[x0f, y0f], [x1f, y0f],
                                [x1f, y1f], [x0f, y1f]], dtype=np.float64)
            wh = (x1f - x0f, y1f - y0f)
        else:
            corners, wh = min_area_rect(run_boundary_points(rows, starts,
                                                            ends))
        _, sside = order_rect_corners(corners, wh)
        if sside < 2:                        # utils/db_utils.py:148
            continue
        # Row-local prefix sums over just this component's row × column
        # window (a text line spans ~10-30% of the page width, so the
        # column crop cuts the cumsum work proportionally).  The window is
        # a SLICE view — ``pred[rows]`` fancy-indexing copied every
        # component row at full page width first; rows with several runs
        # simply index the same csum row twice.
        csum = row_cumsum(pred[r0:r1 + 1, smin:emax])
        score = runs_values_sum(csum, rows - r0, starts - smin,
                                ends - smin) / npix
        expanded = unclip_rect(order_rect_corners(corners, wh)[0], unclip_ratio)
        # The reference re-runs minAreaRect on the unclip output
        # (utils/db_utils.py:168-174) because ITS unclip is a round-join
        # polygon offset; ours grows the rectangle analytically
        # (geom.unclip_rect), so ``expanded`` already IS its own min-area
        # rect and the second calipers pass is an identity — skipped
        # (~25% of the representer's rect work; order_rect_corners ignores
        # the wh argument for the box output).
        box, _ = order_rect_corners(expanded, (0.0, 0.0))
        box[:, 0] = np.clip(np.round(box[:, 0] / width * dest_width), 0, dest_width)
        box[:, 1] = np.clip(np.round(box[:, 1] / height * dest_height), 0, dest_height)
        boxes[i] = box.astype(np.int32)
        scores[i] = score
    return boxes, scores


def extract_lines(lines_map: np.ndarray, cfg: DetectorConfig,
                  active_rows: tuple | None = None):
    """Channel-0 consumption of the DB head output (utils/db_utils.py:54) plus
    the caller-side score gate (inference.py:158-161).

    ``lines_map``: (2, H, W) or (1, 2, H, W) float.  Returns
    ``(lines (m,4,2) int32, scores (m,))`` already filtered by
    ``cfg.box_thresh``.
    """
    pred = np.asarray(lines_map)
    while pred.ndim > 2:
        pred = pred[0]
    boxes, scores = boxes_from_bitmap(
        pred, thresh=cfg.seg_thresh, max_candidates=cfg.max_candidates,
        unclip_ratio=cfg.unclip_ratio, active_rows=active_rows)
    keep = scores > cfg.box_thresh
    return boxes[keep], scores[keep]

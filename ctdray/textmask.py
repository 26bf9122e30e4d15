"""Per-block mask refinement — pure-numpy re-expression of the reference's
``utils/textmask.py`` (K1-K5 in SURVEY.md §2.6).

Semantics preserved from the reference (cited per function); cv2 primitives
are replaced with numpy equivalents:

  cv2.erode/dilate 3×3        → shifted-slice min/max filters (rect / cross)
  cv2.threshold(OTSU)         → geom.otsu_threshold histogram argmax
  cv2.inRange                 → boolean range mask
  cv2.connectedComponentsWithStats → geom.connected_component_runs (+stats)

The greedy XOR-driven component merge (merge_mask_list) is order-dependent;
component order here is first-encounter raster order, matching cv2's scan
order for the 0/255 masks this module feeds it.  The reference operates on
BGR pages; the sandbox corpus is grayscale, handled by treating each "channel"
as the grey plane (prod swaps the decode stage, nothing here changes).

Masks are page-local state: the refine stage runs inside one ``map_batches``
per page window and only compact outputs (PGM bytes / pixel counts) leave it.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from .geom import connected_component_runs, expand_textwindow, otsu_threshold
from .textblock import TextBlock

REFINEMASK_INPAINT = 0     # utils/textmask.py:13
REFINEMASK_ANNOTATION = 1  # utils/textmask.py:14


# ---------------------------------------------------------------------------
# morphology (3×3 only — the only sizes the reference uses)
# ---------------------------------------------------------------------------


def _shift_stack(img: np.ndarray, offsets, pad_value):
    h, w = img.shape
    padded = np.full((h + 2, w + 2), pad_value, dtype=img.dtype)
    padded[1:h + 1, 1:w + 1] = img
    return [padded[1 + dy:h + 1 + dy, 1 + dx:w + 1 + dx] for dy, dx in offsets]

_RECT3 = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
_CROSS3 = [(0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)]


def erode3(img: np.ndarray, shape: str = "rect", iterations: int = 1) -> np.ndarray:
    """cv2.erode with a 3×3 rect/ellipse(=cross) kernel; constant border at
    max so the frame never eats the interior (cv2's default borderValue)."""
    offs = _RECT3 if shape == "rect" else _CROSS3
    out = img
    for _ in range(iterations):
        out = np.minimum.reduce(_shift_stack(out, offs, 255))
    return out


def dilate3(img: np.ndarray, shape: str = "rect", iterations: int = 1) -> np.ndarray:
    offs = _RECT3 if shape == "rect" else _CROSS3
    out = img
    for _ in range(iterations):
        out = np.maximum.reduce(_shift_stack(out, offs, 0))
    return out


# ---------------------------------------------------------------------------
# connected components with stats (cv2.connectedComponentsWithStats shape)
# ---------------------------------------------------------------------------


def components_with_stats(mask_u8: np.ndarray, connectivity: int = 8):
    """Foreground components of a 0/255 mask in first-encounter raster order.
    Returns a list of dicts: {rows, starts, ends, bbox(x1,y1,x2,y2), area}."""
    comps = connected_component_runs(mask_u8 > 0, connectivity)
    out = []
    for rows, starts, ends in comps:
        out.append({
            "rows": rows, "starts": starts, "ends": ends,
            "bbox": (int(starts.min()), int(rows.min()),
                     int(ends.max()), int(rows.max()) + 1),
            "area": int((ends - starts).sum()),
        })
    return out


def _paint_component(canvas: np.ndarray, comp, value=255) -> None:
    for r, s, e in zip(comp["rows"], comp["starts"], comp["ends"]):
        canvas[r, s:e] = value


# ---------------------------------------------------------------------------
# K3: top-k grey color candidates (utils/textmask.py:16-27, 56-71)
# ---------------------------------------------------------------------------


def get_topk_color(color_list, bins, k: int = 3, color_var: int = 10,
                   bin_tol: float = 0.001):
    """Top-k modal grey values, ≥``color_var`` apart, stopping early at
    ``k`` picks or once a candidate's count drops under ``bin_tol`` of the
    total (semantics of utils/textmask.py:16-27 — including the caller's
    swapped histogram outputs: ``color_list`` is the bin-EDGE array and
    ``bins`` the counts; the edge array being one longer is harmless because
    descending-count order never reaches the dangling edge).
    """
    order = np.argsort(-np.asarray(bins))
    colors_desc = np.asarray(color_list)[order]
    counts_desc = np.asarray(bins)[order]
    picked = [colors_desc[0]]
    min_count = counts_desc.sum() * bin_tol
    for color, count in zip(colors_desc[1:], counts_desc[1:]):
        if min(abs(p - color) for p in picked) > color_var:
            picked.append(color)
        if len(picked) >= k or count < min_count:
            break
    return picked


def minxor_thresh(threshed: np.ndarray, mask: np.ndarray, dilate: bool = False):
    """Keep the polarity (mask vs inverse) minimizing XOR with the predicted
    mask (utils/textmask.py:29-41)."""
    neg_threshed = 255 - threshed
    if dilate:
        neg_threshed = dilate3(neg_threshed, "rect")
        threshed = dilate3(threshed, "rect")
    neg_xor_sum = int(np.bitwise_xor(neg_threshed, mask).sum())
    xor_sum = int(np.bitwise_xor(threshed, mask).sum())
    if neg_xor_sum < xor_sum:
        return neg_threshed, neg_xor_sum
    return threshed, xor_sum


def _channels(img: np.ndarray):
    if img.ndim == 2:
        return [img, img, img]          # grayscale corpus: same plane ×3
    return [img[..., 0], img[..., 1], img[..., 2]]


def get_otsuthresh_masklist(img: np.ndarray, pred_mask: np.ndarray,
                            per_channel: bool = False):
    """Per-channel Otsu threshold candidates, best-XOR first
    (utils/textmask.py:43-54)."""
    mask_list = []
    for c in _channels(img):
        t = otsu_threshold(c)
        threshed = np.where(c > t, 255, 0).astype(np.uint8)
        threshed, xor_sum = minxor_thresh(threshed, pred_mask, dilate=False)
        mask_list.append([threshed, xor_sum])
    mask_list.sort(key=lambda x: x[1])
    return mask_list if per_channel else [mask_list[0]]


def get_topk_masklist(im_grey: np.ndarray, pred_mask: np.ndarray):
    """Top-3 grey modes of predicted-text pixels → ±30 inRange candidates
    (utils/textmask.py:56-71)."""
    if im_grey.ndim == 3 and im_grey.shape[-1] == 3:
        # BT.601 grey as cv2.cvtColor(BGR2GRAY)
        im_grey = (0.114 * im_grey[..., 0] + 0.587 * im_grey[..., 1]
                   + 0.299 * im_grey[..., 2]).round().astype(np.uint8)
    candidate = im_grey[erode3(pred_mask, "rect") > 127]
    if candidate.size == 0:
        candidate = im_grey.reshape(-1)
    counts, edges = np.histogram(candidate, bins=255)
    topk_color = get_topk_color(edges, counts, color_var=10, k=3)
    color_range = 30
    mask_list = []
    for color in topk_color:
        c_top = min(color + color_range, 255)
        c_bottom = c_top - 2 * color_range
        threshed = (np.where((im_grey >= c_bottom) & (im_grey <= c_top), 255, 0)
                    .astype(np.uint8))
        threshed, xor_sum = minxor_thresh(threshed, pred_mask)
        mask_list.append([threshed, xor_sum])
    return mask_list


# ---------------------------------------------------------------------------
# K4: greedy XOR merge + hole fill (utils/textmask.py:73-132)
# ---------------------------------------------------------------------------


def merge_mask_list(mask_list, pred_mask: np.ndarray,
                    blk: Optional[TextBlock] = None, pred_thresh: int = 30,
                    text_window=None, filter_with_lines: bool = False,
                    refine_mode: int = REFINEMASK_INPAINT) -> np.ndarray:
    """Greedily keep candidate components that reduce XOR vs the (eroded,
    binarized) predicted mask, then fill interior holes.  Iteration order
    preserved exactly — the merge is order-dependent."""
    mask_list.sort(key=lambda x: x[1])
    if pred_thresh > 0:
        pred_mask = erode3(pred_mask, "cross")                 # MORPH_ELLIPSE 3×3
        pred_mask = np.where(pred_mask > 60, 255, 0).astype(np.uint8)
    mask_merged = np.zeros_like(pred_mask)
    for candidate_mask, _xor in mask_list:
        for comp in components_with_stats(candidate_mask, connectivity=8):
            x1, y1, x2, y2 = comp["bbox"]
            if (x2 - x1) * (y2 - y1) < 3:                      # :97
                continue
            tmp = np.array(mask_merged[y1:y2, x1:x2])
            for r, s, e in zip(comp["rows"], comp["starts"], comp["ends"]):
                tmp[r - y1, s - x1:e - x1] = 255
            win_pred = pred_mask[y1:y2, x1:x2]
            xor_merged = int(np.bitwise_xor(tmp, win_pred).sum())
            xor_origin = int(np.bitwise_xor(mask_merged[y1:y2, x1:x2], win_pred).sum())
            if xor_merged < xor_origin:
                mask_merged[y1:y2, x1:x2] = tmp
    if refine_mode == REFINEMASK_INPAINT:
        mask_merged = dilate3(mask_merged, "rect")
    # hole fill: components of the inverse; every non-largest background
    # region that reduces XOR is filled (:112-131)
    comps = components_with_stats(255 - mask_merged, connectivity=8)
    # cv2's stats include label 0 — the inverse image's background, i.e. the
    # merged mask's text area — in the sorted-area list (utils/textmask.py:
    # 113-118); components_with_stats returns foreground comps only, so the
    # complement area must be prepended or the largest interior hole can go
    # unfilled whenever the text area exceeds it.
    complement_area = int((mask_merged > 0).sum())
    areas = sorted([complement_area] + [c["area"] for c in comps])
    area_thresh = areas[-2] if len(areas) > 1 else (areas[-1] if areas else 0)
    for comp in comps:
        if comp["area"] < area_thresh:
            x1, y1, x2, y2 = comp["bbox"]
            tmp = np.array(mask_merged[y1:y2, x1:x2])
            for r, s, e in zip(comp["rows"], comp["starts"], comp["ends"]):
                tmp[r - y1, s - x1:e - x1] = 255
            win_pred = pred_mask[y1:y2, x1:x2]
            if int(np.bitwise_xor(tmp, win_pred).sum()) < \
               int(np.bitwise_xor(mask_merged[y1:y2, x1:x2], win_pred).sum()):
                mask_merged[y1:y2, x1:x2] = tmp
    return mask_merged


# ---------------------------------------------------------------------------
# K1 / K5: per-block driver + undetected-region recovery
# (utils/textmask.py:135-169)
# ---------------------------------------------------------------------------


def refine_mask(img: np.ndarray, pred_mask: np.ndarray,
                blk_list: List[TextBlock],
                refine_mode: int = REFINEMASK_INPAINT) -> np.ndarray:
    """Per block: expand window (expand_r=16) → candidate masks (top-k grey +
    best Otsu) → greedy merge → OR into the page canvas
    (utils/textmask.py:159-169)."""
    mask_refined = np.zeros_like(pred_mask)
    for blk in blk_list:
        bx1, by1, bx2, by2 = expand_textwindow(img.shape, blk.xyxy, expand_r=16)
        im = np.ascontiguousarray(img[by1:by2, bx1:bx2])
        msk = np.ascontiguousarray(pred_mask[by1:by2, bx1:bx2])
        if im.size == 0:
            continue
        mask_list = get_topk_masklist(im, msk)
        mask_list += get_otsuthresh_masklist(im, msk, per_channel=False)
        merged = merge_mask_list(mask_list, msk, blk=blk,
                                 text_window=[bx1, by1, bx2, by2],
                                 refine_mode=refine_mode)
        mask_refined[by1:by2, bx1:bx2] = np.bitwise_or(
            mask_refined[by1:by2, bx1:bx2], merged)
    return mask_refined


def refine_undetected_mask(img: np.ndarray, mask_pred: np.ndarray,
                           mask_refined: np.ndarray,
                           blk_list: List[TextBlock],
                           refine_mode: int = REFINEMASK_INPAINT) -> np.ndarray:
    """Recover predicted-text regions not covered by any block: CC (4-conn,
    area>50) less than half-covered by every block bbox become synthetic
    blocks and are refined too (utils/textmask.py:135-156)."""
    mask_pred = np.array(mask_pred)
    mask_pred[mask_refined > 30] = 0
    pred_t = np.where(mask_pred > 30, 255, 0).astype(np.uint8)
    comps = [c for c in components_with_stats(pred_t, connectivity=4)
             if c["area"] > 50]
    # Reference iterates valid_labels[1:] (utils/textmask.py:142) where
    # valid_labels[0] is cv2's BACKGROUND label 0 (zero pixels of pred_t,
    # area almost always > 50) — so every real foreground region survives.
    # components_with_stats returns foreground comps only: drop the first
    # comp only in the degenerate case the background itself is ≤ 50 px
    # (then cv2's valid_labels[0] is the first foreground comp).
    bg_area = int((pred_t == 0).sum())
    if bg_area <= 50 and comps:
        comps = comps[1:]
    seg_blk_list = []
    for comp in comps:
        bx1, by1, bx2, by2 = comp["bbox"]
        w, h = bx2 - bx1, by2 - by1
        bbox_score = -1.0
        for blk in blk_list:
            ix1 = max(blk.xyxy[0], bx1); iy1 = max(blk.xyxy[1], by1)
            ix2 = min(blk.xyxy[2], bx2); iy2 = min(blk.xyxy[3], by2)
            inter = (ix2 - ix1) * (iy2 - iy1) if (ix2 > ix1 and iy2 > iy1) else -1
            bbox_score = max(bbox_score, inter)
        if w > 0 and h > 0 and bbox_score / w / h < 0.5:
            seg_blk_list.append(TextBlock([bx1, by1, bx2, by2]))
    if seg_blk_list:
        mask_refined = np.bitwise_or(
            mask_refined, refine_mask(img, mask_pred, seg_blk_list,
                                      refine_mode=refine_mode))
    return mask_refined

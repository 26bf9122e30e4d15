"""TextBlock record + line grouping/merging/splitting/reading-order heuristics.

Fresh implementation of the reference's core extraction semantics
(utils/textblock.py) on plain numpy: every threshold, asymmetry and quirk that
affects the span contract is kept and cited:

  * line→block assignment by intersection/line_area > 0.4 with the -1-area
    disjoint sentinel                       (utils/textblock.py:428-453)
  * 'ja' uses norm_v > norm_h, others need norm_v > 2·norm_h (the 2× vertical
    asymmetry)                              (utils/textblock.py:312-315)
  * reading origin (im_w, 0) for vertical right-to-left text, else (0, 0)
                                            (utils/textblock.py:317-323)
  * angle snapped to 0 when |angle| < 3°    (utils/textblock.py:335-336)
  * merge gates: font ratio ≤ 1.3, |cosΔ| ≥ cos30°, center-distance and
    corner-distance tolerances              (utils/textblock.py:344-373)
  * split on distance gap > 2·font_size with the near-upright vertical-ja
    sub-rule                                (utils/textblock.py:390-419)
  * grid reading order with right-to-left flip for majority-ja pages and the
    two-half-page treatment of wide pages   (utils/textblock.py:267-300)
  * final expansion of horizontal eng lines by max(int(fs·0.1), 2) px
                                            (utils/textblock.py:492-506)

Greedy passes are order-dependent by design — iteration order is preserved
verbatim.  All functions are pure-Python/numpy and run inside ``map_batches``
UDFs, one page at a time (embarrassingly parallel; no Ray dependency here).
"""
from __future__ import annotations

import copy
import math
from typing import List, Optional

import numpy as np

from .geom import (
    boxes_intersection_area,
    quads_intersect,
    rotate_polygons,
    xywh2xyxypoly,
)

LANG_LIST = ["eng", "ja", "unknown"]

BBOX_SCORE_THRESH = 0.4   # utils/textblock.py:429
MASK_SCORE_THRESH = 0.1   # utils/textblock.py:430


class TextBlock:
    """Mutable per-block record (the fields inference fills,
    utils/textblock.py:12-86; dormant GUI/translation fields dropped per
    SURVEY.md §1.3)."""

    __slots__ = (
        "xyxy", "lines", "language", "vertical", "font_size", "distance",
        "angle", "vec", "norm", "merged", "weight", "fg_rgb", "bg_rgb",
        "line_spacing", "_alignment",
    )

    def __init__(self, xyxy, lines=None, language: str = "unknown",
                 vertical: bool = False, font_size: float = -1.0):
        self.xyxy = [int(v) for v in xyxy]
        self.lines: list = [] if lines is None else list(lines)
        self.language = language
        self.vertical = vertical
        self.font_size = font_size
        self.distance: Optional[np.ndarray] = None
        self.angle = 0
        self.vec: Optional[np.ndarray] = None
        self.norm = -1.0
        self.merged = False
        self.weight = -1.0
        self.fg_rgb = [0, 0, 0]
        self.bg_rgb = [0, 0, 0]
        self.line_spacing = 1.0
        self._alignment = -1

    # -- geometry ----------------------------------------------------------

    def lines_array(self, dtype=np.float64) -> np.ndarray:
        return np.array(self.lines, dtype=dtype)

    def adjust_bbox(self, with_bbox: bool = False) -> None:
        """bbox := extremes over line coords, optionally unioned with the
        existing bbox (utils/textblock.py:87-98)."""
        lines = self.lines_array().astype(np.int32)
        xs, ys = lines[..., 0], lines[..., 1]
        if with_bbox:
            self.xyxy = [
                int(min(xs.min(), self.xyxy[0])),
                int(min(ys.min(), self.xyxy[1])),
                int(max(xs.max(), self.xyxy[2])),
                int(max(ys.max(), self.xyxy[3])),
            ]
        else:
            self.xyxy = [int(xs.min()), int(ys.min()), int(xs.max()), int(ys.max())]

    def sort_lines(self) -> None:
        """Order lines by perpendicular distance to the reading origin
        (utils/textblock.py:100-105)."""
        if self.distance is not None:
            idx = np.argsort(self.distance, kind="stable")
            self.distance = self.distance[idx]
            lines = np.array(self.lines, dtype=np.int32)
            self.lines = [l for l in lines[idx]]

    def center(self) -> np.ndarray:
        xyxy = np.array(self.xyxy, dtype=np.float64)
        return (xyxy[:2] + xyxy[2:]) / 2

    def min_rect(self, rotate_back: bool = True) -> np.ndarray:
        """Rotation-aware minimal bbox over the block's lines
        (utils/textblock.py:121-134)."""
        angled = self.angle != 0
        center = self.center()
        polys = self.lines_array().reshape(-1, 8)
        if angled:
            polys = rotate_polygons(center, polys, self.angle)
        min_x, max_x = polys[:, ::2].min(), polys[:, ::2].max()
        min_y, max_y = polys[:, 1::2].min(), polys[:, 1::2].max()
        rect = np.array([[min_x, min_y, max_x, min_y, max_x, max_y, min_x, max_y]])
        if angled and rotate_back:
            rect = rotate_polygons(center, rect, -self.angle)
        return rect.reshape(-1, 4, 2).astype(np.int64)

    def alignment(self) -> int:
        """Left-vs-center vote by comparing the std of left edges vs line
        centers (utils/textblock.py:233-253); 0=left, 1=center."""
        if self._alignment >= 0:
            return self._alignment
        if self.vertical:
            return 0
        lines = self.lines_array()
        if len(lines) == 1:
            return 0
        polys = lines.reshape(-1, 8)
        if self.angle != 0:
            polys = rotate_polygons((0, 0), polys, self.angle)
        polys = polys.reshape(-1, 4, 2)
        left_std = float(np.std(polys[:, 0, 0]))
        center_std = float(np.std((polys[:, 0, 0] + polys[:, 1, 0]) / 2))
        return 0 if left_std < center_std else 1

    def stroke_width(self, default: float = 0.2) -> float:
        """0.2 when fg/bg differ by > 40 summed-abs RGB, else 0
        (utils/textblock.py:258-265).  Reference quirk preserved: the
        comparison runs on the RAW ACCUMULATED per-line sums (fg_r etc. are
        stored ×num_lines in accumulate mode), not the averages."""
        var = int(np.abs(np.array(self.fg_rgb, dtype=np.float64)
                         - np.array(self.bg_rgb, dtype=np.float64)).sum())
        return default if var > 40 else 0.0

    def accumulate_font_color(self, frgb, brgb) -> None:
        """Add ONE line's sampled fg/stroke color into the accumulated
        fields — after every line contributed, the stored value equals the
        reference's ``set_font_colors(mean, accumulate=True)`` representation
        (mean × num_lines, utils/textblock.py:200-207)."""
        self.fg_rgb = [a + float(b) for a, b in zip(self.fg_rgb, frgb)]
        self.bg_rgb = [a + float(b) for a, b in zip(self.bg_rgb, brgb)]

    def font_colors(self) -> tuple:
        """(fg, bg) averaged per line, int32-truncated —
        ``get_font_colors`` (utils/textblock.py:209-226); [0,0,0] for a
        block with no lines."""
        n = len(self.lines)
        if n == 0:
            return [0, 0, 0], [0, 0, 0]
        fg = (np.array(self.fg_rgb, dtype=np.float64) / n).astype(np.int32)
        bg = (np.array(self.bg_rgb, dtype=np.float64) / n).astype(np.int32)
        return fg.tolist(), bg.tolist()

    @classmethod
    def from_struct(cls, d: dict) -> "TextBlock":
        """Hydrate from a schema.BLOCK_STRUCT dict — the engine's JSON-block
        round trip (``TextBlock(**blk_dict)``, inference.py:190-192, S8)."""
        blk = cls(d["xyxy"],
                  lines=[np.asarray(l, dtype=np.int32).reshape(4, 2)
                         for l in d.get("lines", [])],
                  language=d.get("language", "unknown"),
                  vertical=bool(d.get("vertical", False)),
                  font_size=float(d.get("font_size", -1.0)))
        blk.angle = int(d.get("angle", 0))
        dist = d.get("distance")
        blk.distance = None if dist is None or len(dist) == 0 \
            else np.asarray(dist, dtype=np.float64)
        blk.fg_rgb = [int(v) for v in d.get("fg_rgb", [0, 0, 0])]
        blk.bg_rgb = [int(v) for v in d.get("bg_rgb", [0, 0, 0])]
        blk.line_spacing = float(d.get("line_spacing", 1.0))
        return blk

    def to_struct(self, order: int = -1) -> dict:
        """Arrow-friendly dict matching schema.BLOCK_STRUCT."""
        return {
            "xyxy": [int(v) for v in self.xyxy],
            "lines": [np.asarray(l, dtype=np.int64).reshape(8).astype(np.int32).tolist()
                      for l in self.lines],
            "language": self.language,
            "vertical": bool(self.vertical),
            "font_size": float(self.font_size),
            "angle": int(self.angle),
            "distance": ([] if self.distance is None else
                         np.asarray(self.distance, dtype=np.float64).tolist()),
            "alignment": int(self.alignment()),
            "fg_rgb": [int(v) for v in self.fg_rgb],
            "bg_rgb": [int(v) for v in self.bg_rgb],
            "line_spacing": float(self.line_spacing),
            "order": int(order),
        }


# ---------------------------------------------------------------------------


def _mask_density(mask, x1, y1, x2, y2) -> float:
    """mean(mask[y1:y2, x1:x2])/255; NaN for an empty window, reproducing the
    reference's numpy empty-slice behavior (NaN comparisons are False, so an
    empty-window candidate is *kept* — utils/textblock.py:443-447,459-464).
    ``mask`` is an ndarray or a geom.ResizedMaskView (lazy, bit-identical)."""
    if hasattr(mask, "density"):
        return mask.density(x1, y1, x2, y2)
    win = mask[int(y1):int(y2), int(x1):int(x2)]
    if win.size == 0:
        return float("nan")
    return float(win.mean()) / 255.0


def examine_textblk(blk: TextBlock, im_w: int, im_h: int, sort: bool = False) -> None:
    """Orientation vote + reading-origin distances + font size + angle
    (utils/textblock.py:302-342)."""
    lines = blk.lines_array()
    mids = (lines[:, [1, 2, 3, 0]] + lines) / 2          # per-line edge midpoints
    vec_v = mids[:, 2] - mids[:, 0]                      # bottom-mid − top-mid
    vec_h = mids[:, 1] - mids[:, 3]                      # right-mid − left-mid
    centers = (lines[:, 0] + lines[:, 2]) / 2
    v = vec_v.sum(axis=0)
    h = vec_h.sum(axis=0)
    norm_v, norm_h = math.sqrt(float(v @ v)), math.sqrt(float(h @ h))
    if blk.language == "ja":
        vertical = norm_v > norm_h                       # utils/textblock.py:312-313
    else:
        vertical = norm_v > norm_h * 2                   # utils/textblock.py:315
    if vertical:
        primary_vec, primary_norm = v, norm_v
        origin = np.array([[im_w, 0]], dtype=np.float64)  # right-to-left origin
        font_size = int(round(norm_h / len(lines)))
    else:
        primary_vec, primary_norm = h, norm_h
        origin = np.array([[0, 0]], dtype=np.float64)
        font_size = int(round(norm_v / len(lines)))
    dvec = centers - origin
    angle = int(math.atan2(primary_vec[1], primary_vec[0]) / math.pi * 180)
    dist = np.sqrt((dvec * dvec).sum(axis=1))
    with np.errstate(invalid="ignore", divide="ignore"):
        rad = np.arccos(np.einsum("ij,j->i", dvec, primary_vec) / (dist * primary_norm))
        dist = np.abs(np.sin(rad) * dist)
    blk.lines = [l for l in lines.astype(np.int32)]
    blk.distance = dist
    blk.angle = angle - 90 if vertical else angle
    if abs(blk.angle) < 3:                               # utils/textblock.py:335-336
        blk.angle = 0
    blk.font_size = font_size
    blk.vertical = vertical
    blk.vec = primary_vec
    blk.norm = primary_norm
    if sort:
        blk.sort_lines()


def try_merge_textline(blk: TextBlock, blk2: TextBlock,
                       fntsize_tol: float = 1.3, distance_tol: float = 2.0) -> bool:
    """Greedy pairwise merge of scattered single-line blocks
    (utils/textblock.py:344-373).  Mutates ``blk`` on success and marks
    ``blk2`` merged."""
    if blk2.merged:
        return False
    fnt_div = blk.font_size / blk2.font_size
    n1, n2 = len(blk.lines), len(blk2.lines)
    fnt_avg = (blk.font_size * n1 + blk2.font_size * n2) / (n1 + n2)
    vec_prod = float(blk.vec @ blk2.vec)
    vec_sum = blk.vec + blk2.vec
    cos_vec = vec_prod / blk.norm / blk2.norm
    dist_gap = float(blk2.distance[-1] - blk.distance[-1])
    _cg = (np.asarray(blk2.lines[-1][0], dtype=np.float64)
           - np.asarray(blk.lines[-1][0], dtype=np.float64))
    corner_gap = math.sqrt(float(_cg @ _cg))
    if not quads_intersect(blk.lines[-1], blk2.lines[-1]):
        if fnt_div > fntsize_tol or 1 / fnt_div > fntsize_tol:
            return False
        if abs(cos_vec) < 0.866:                          # cos 30°
            return False
        if dist_gap > distance_tol * fnt_avg or corner_gap > fnt_avg * 2.5:
            return False
    blk.lines.append(blk2.lines[0])
    blk.vec = vec_sum
    blk.angle = int(round(np.rad2deg(math.atan2(vec_sum[1], vec_sum[0]))))
    if blk.vertical:
        blk.angle -= 90
    blk.norm = math.sqrt(float(vec_sum @ vec_sum))
    blk.distance = np.append(blk.distance, blk2.distance[-1])
    blk.font_size = fnt_avg
    blk2.merged = True
    return True


def merge_textlines(blk_list: List[TextBlock]) -> List[TextBlock]:
    """One greedy O(n²) pass over scattered blocks sorted by distance[0]
    (utils/textblock.py:375-388)."""
    if len(blk_list) < 2:
        return blk_list
    blk_list.sort(key=lambda b: b.distance[0])
    merged = []
    for ii, cur in enumerate(blk_list):
        if cur.merged:
            continue
        for other in blk_list[ii + 1:]:
            try_merge_textline(cur, other)
        merged.append(cur)
    for blk in merged:
        blk.adjust_bbox(with_bbox=False)
    return merged


def _clone_blk(blk: TextBlock) -> TextBlock:
    """Field-shallow clone for :func:`split_textblk`.  Every mutating path
    on TextBlock REASSIGNS its fields (adjust_bbox/sort_lines replace
    xyxy/lines/distance wholesale, nothing edits them in place), so sharing
    the field objects between clones is safe; ``lines`` gets a fresh list
    because split assembles it per sub-block.  deepcopy here was ~5% of the
    whole per-page postprocess."""
    new = copy.copy(blk)
    new.lines = list(blk.lines)
    return new


def split_textblk(blk: TextBlock):
    """Split a multi-line block at distance gaps (utils/textblock.py:390-419).

    Reference quirks preserved: lines are re-sorted by first-corner distance
    to the first line while ``distance`` keeps its sort_lines order, and the
    near-upright (<15°) vertical block sub-rule compares first-corner y gaps.
    """
    font_size, distance, lines = blk.font_size, blk.distance, blk.lines
    l0 = np.asarray(blk.lines[0], dtype=np.float64)
    lines.sort(key=lambda l: float(np.sqrt((( np.asarray(l, dtype=np.float64)[0] - l0[0]) ** 2).sum())))
    distance_tol = font_size * 2
    cur = _clone_blk(blk)
    cur.lines = [lines[0]]
    sub_blocks = [cur]
    did_split = False
    for jj, line in enumerate(lines[1:]):
        split = False
        if not quads_intersect(lines[jj], line):
            gap = abs(float(distance[jj + 1] - distance[jj]))
            if gap > distance_tol:
                split = True
            elif blk.vertical and abs(blk.angle) < 15:
                if len(cur.lines) > 1 or gap > font_size:
                    split = abs(int(lines[jj][0][1]) - int(line[0][1])) > font_size
        if split:
            cur = _clone_blk(cur)
            cur.lines = [line]
            sub_blocks.append(cur)
        else:
            cur.lines.append(line)
    if len(sub_blocks) > 1:
        did_split = True
        for b in sub_blocks:
            b.adjust_bbox(with_bbox=False)
    return did_split, sub_blocks


def sort_textblk_list(blk_list: List[TextBlock], im_w: int, im_h: int) -> List[TextBlock]:
    """Reading order: 3×4 grid weights, right-to-left flip for majority-ja
    pages, wide pages treated as two stacked half-pages
    (utils/textblock.py:267-300)."""
    if len(blk_list) == 0:
        return blk_list
    num_ja = sum(1 for b in blk_list if b.language == "ja")
    xyxy = np.array([b.xyxy for b in blk_list], dtype=np.float64)
    flip_lr = num_ja > len(blk_list) / 2
    im_oriw = im_w
    if im_w > im_h:
        im_w = im_w / 2
    num_gridy, num_gridx = 4, 3
    img_area = im_h * im_w
    center_x = (xyxy[:, 0] + xyxy[:, 2]) / 2
    if flip_lr:
        center_x = (im_oriw - center_x) if im_w != im_oriw else (im_w - center_x)
    grid_x = (center_x / im_w * num_gridx).astype(np.int32)
    center_y = (xyxy[:, 1] + xyxy[:, 3]) / 2
    grid_y = (center_y / im_h * num_gridy).astype(np.int32)
    grid_idx = grid_y * num_gridx + grid_x
    weights = (grid_idx * img_area
               + 1.2 * (center_x - grid_x * im_w / num_gridx)
               + (center_y - grid_y * im_h / num_gridy))
    if im_w != im_oriw:
        weights[grid_x >= num_gridx] += img_area * num_gridy * num_gridx
    for blk, w in zip(blk_list, weights):
        blk.weight = float(w)
    blk_list.sort(key=lambda b: b.weight)
    return blk_list


def sample_line_colors(img: np.ndarray, mask, line) -> tuple:
    """Per-line fg/bg color sample from the decoded page: fg = mean color of
    the pixels the predicted text mask marks inside the line's bbox window,
    bg = mean of the remaining window pixels.  This is the engine's pixel
    sampler feeding the reference's accumulative font-color API
    (set_font_colors/get_font_colors, utils/textblock.py:200-226 — the
    reference ships the accumulator but leaves sampling to its GUI callers).
    Grayscale pages broadcast to an (r,g,b) triple.  ``mask`` may be an
    ndarray or a geom.ResizedMaskView (windowed, bit-identical)."""
    line = np.asarray(line)
    h, w = img.shape[0], img.shape[1]
    x1 = max(0, int(line[:, 0].min())); x2 = min(w, int(line[:, 0].max()))
    y1 = max(0, int(line[:, 1].min())); y2 = min(h, int(line[:, 1].max()))
    if x2 <= x1 or y2 <= y1:
        return (0.0, 0.0, 0.0), (0.0, 0.0, 0.0)
    # bg samples from a margin-expanded window: the line quad wraps the
    # glyphs tightly, so the background lives just outside it
    m = max(2, (min(x2 - x1, y2 - y1)) // 4)
    ex1, ey1 = max(0, x1 - m), max(0, y1 - m)
    ex2, ey2 = min(w, x2 + m), min(h, y2 + m)
    win = img[ey1:ey2, ex1:ex2]
    if win.ndim == 2:
        win = win[..., None]
    if hasattr(mask, "window"):
        mwin = mask.window(ex1, ey1, ex2, ey2)
    else:
        mwin = np.asarray(mask)[ey1:ey2, ex1:ex2]
    text_sel = mwin > 127
    # fg restricted to the un-expanded line bbox: select on the inner slices
    # directly (row-major order over the inner window is the same value
    # sequence as masking the full window with an inner-rect AND, so the
    # pairwise-summed mean is bit-identical) — avoids allocating a
    # window-sized boolean per line.
    isel = (slice(y1 - ey1, y2 - ey1), slice(x1 - ex1, x2 - ex1))
    fg_sel = text_sel[isel]
    nc = win.shape[2]
    fg = win[isel][fg_sel].reshape(-1, nc).mean(axis=0) if fg_sel.any() \
        else np.zeros(nc)
    bg_sel = ~text_sel
    bg = win[bg_sel].reshape(-1, nc).mean(axis=0) if bg_sel.any() \
        else np.zeros(nc)
    if nc == 1:
        fg, bg = np.repeat(fg, 3), np.repeat(bg, 3)
    return tuple(float(v) for v in fg), tuple(float(v) for v in bg)


def group_output(boxes: np.ndarray, classes: np.ndarray, confs: np.ndarray,
                 lines, im_w: int, im_h: int,
                 mask: Optional[np.ndarray] = None,
                 sort_blklist: bool = True,
                 img: Optional[np.ndarray] = None) -> List[TextBlock]:
    """The core extraction heuristic (utils/textblock.py:421-508): assign
    detected line quads to detected blocks, finalize/split blocks, merge
    scattered lines, sort into reading order, expand horizontal-eng lines.

    ``boxes`` (n,4) int xyxy, ``classes`` (n,) int, ``confs`` (n,) float are
    the NMS'd YOLO outputs mapped to original image coordinates; ``lines`` is
    a sequence of (4,2) int quads; ``mask`` the uint8 text mask at original
    size.
    """
    blk_list = [TextBlock(b, language=LANG_LIST[int(c)]) for b, c in zip(boxes, classes)]
    scattered = {"ver": [], "hor": []}

    # step 1: assign lines to blocks (utils/textblock.py:428-453)
    blk_xyxy = np.array([b.xyxy for b in blk_list], dtype=np.float64).reshape(-1, 4)
    for line in lines:
        line = np.asarray(line)
        bx1, bx2 = int(line[:, 0].min()), int(line[:, 0].max())
        by1, by2 = int(line[:, 1].min()), int(line[:, 1].max())
        line_area = (by2 - by1) * (bx2 - bx1)
        if len(blk_list):
            scores = boxes_intersection_area(blk_xyxy, [bx1, by1, bx2, by2]) / line_area
            best = int(np.argmax(scores))
            best_score = float(scores[best])
        else:
            best_score = -1.0
        if best_score > BBOX_SCORE_THRESH:
            blk_list[best].lines.append(line)
        else:
            if mask is not None:
                density = _mask_density(mask, bx1, by1, bx2, by2)
                if density < MASK_SCORE_THRESH:
                    continue
            blk = TextBlock([bx1, by1, bx2, by2], [line])
            examine_textblk(blk, im_w, im_h, sort=False)
            scattered["ver" if blk.vertical else "hor"].append(blk)

    # step 2: finalize blocks, split ja/vertical multi-line blocks
    # (utils/textblock.py:455-484)
    final: List[TextBlock] = []
    for blk in blk_list:
        if len(blk.lines) == 0:
            bx1, by1, bx2, by2 = blk.xyxy
            if mask is not None:
                density = _mask_density(mask, bx1, by1, bx2, by2)
                if density < MASK_SCORE_THRESH:
                    continue
            rect = np.array([[bx1, by1, bx2 - bx1, by2 - by1]])
            blk.lines = [q for q in xywh2xyxypoly(rect).reshape(-1, 4, 2)]
        examine_textblk(blk, im_w, im_h, sort=True)
        want_split = len(blk.lines) > 1 and (blk.language == "ja" or blk.vertical)
        if want_split:
            did_split, subs = split_textblk(blk)
        else:
            did_split, subs = False, [blk]
        if not did_split:
            for b in subs:
                b.adjust_bbox(with_bbox=True)
        final += subs

    # step 3: merge scattered lines, sort into reading order
    # (utils/textblock.py:486-506)
    final += merge_textlines(scattered["hor"])
    final += merge_textlines(scattered["ver"])
    if sort_blklist:
        final = sort_textblk_list(final, im_w, im_h)

    for blk in final:
        if blk.language == "eng" and not blk.vertical and len(blk.lines) > 0:
            expand = max(int(blk.font_size * 0.1), 2)
            rad = np.deg2rad(blk.angle)
            shift = (np.array([[[-1, -1], [1, -1], [1, 1], [-1, 1]]], dtype=np.float64)
                     * np.array([[[np.sin(rad), np.cos(rad)]]]) * expand)
            lines = blk.lines_array() + shift
            lines[..., 0] = np.clip(lines[..., 0], 0, im_w - 1)
            lines[..., 1] = np.clip(lines[..., 1], 0, im_h - 1)
            blk.lines = [l for l in lines.astype(np.int64)]
            blk.font_size += expand

    # O13: per-line accumulative fg/bg color sampling from the decoded page
    # (opt-in — the caller passes the page only when it already holds the
    # pixels, so the span-only hot path never decodes for colors).
    if img is not None and mask is not None:
        for blk in final:
            for line in blk.lines:
                frgb, brgb = sample_line_colors(img, mask, line)
                blk.accumulate_font_color(frgb, brgb)
    return final


def get_transformed_region(blk: TextBlock, img: np.ndarray, idx: int,
                           textheight: int) -> np.ndarray:
    """Homography-rectify one detected line to a fixed text height — the
    downstream-OCR hook (utils/textblock.py:162-194).  eng/unknown-horizontal
    lines are padded by font_size/3 before warping; vertical lines are warped
    then rotated 90° CCW so OCR always sees horizontal text.  cv2
    findHomography(RANSAC)+warpPerspective become the exact 4-point solve +
    numpy inverse-mapped warp (geom.homography_4pt / warp_perspective)."""
    from .geom import homography_4pt, warp_perspective

    im_h, im_w = img.shape[:2]
    src_pts = np.array(blk.lines[idx], dtype=np.float64)
    if blk.language == "eng" or (blk.language == "unknown" and not blk.vertical):
        e_size = blk.font_size / 3
        src_pts[..., 0] += np.array([-e_size, e_size, e_size, -e_size])
        src_pts[..., 1] += np.array([-e_size, -e_size, e_size, e_size])
        src_pts[..., 0] = np.clip(src_pts[..., 0], 0, im_w)
        src_pts[..., 1] = np.clip(src_pts[..., 1], 0, im_h)
    middle_pnt = (src_pts[[1, 2, 3, 0]] + src_pts) / 2
    vec_v = middle_pnt[2] - middle_pnt[0]
    vec_h = middle_pnt[1] - middle_pnt[3]
    norm_v = math.sqrt(float(vec_v @ vec_v))
    norm_h = math.sqrt(float(vec_h @ vec_h))
    ratio = norm_v / norm_h if norm_h > 0 else 1.0
    if not blk.vertical:
        h = int(textheight)
        w = int(round(textheight / ratio)) if ratio > 0 else int(textheight)
        dst = np.array([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]],
                       dtype=np.float64)
        m = homography_4pt(src_pts, dst)
        return warp_perspective(img, m, w, h)
    w = int(textheight)
    h = int(round(textheight * ratio))
    dst = np.array([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]],
                   dtype=np.float64)
    m = homography_4pt(src_pts, dst)
    region = warp_perspective(img, m, w, h)
    return np.rot90(region)          # cv2.ROTATE_90_COUNTERCLOCKWISE

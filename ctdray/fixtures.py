"""Deterministic synthetic corpus + page generator (no fonts, no files).

Reproduces the *semantics* of the reference's synthetic comic-page generator
(``ComicTextSampler.drawtext_one_page``, text_rendering.py:313-403: collision
-free random placement of multi-line text blocks, per-line tight quads,
adaptive fg/bg contrast) with axis-aligned filled line rectangles instead of
font glyphs (FIXTURES.md §2), seeded entirely by ``media_ref`` so any worker
can regenerate a page's ground truth without shared state.

The interleaved document table follows BASELINE.json ``input_hint``:
``doc_id: string, spans: list<struct<kind, text, media_ref, offset>>``.
"""
from __future__ import annotations

import functools
import hashlib
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from .geom import box_intersection_area, fill_convex_poly, rotate_polygons
from .schema import DOC_SCHEMA

# Page size pool (w, h); the wide page exercises the two-half-page reading
# order rule (utils/textblock.py:278-295).
_PAGE_SIZES = [(845, 1280), (1024, 1536), (1200, 800)]
_PAGE_SIZE_P = [0.4, 0.4, 0.2]

_WORDS = (
    "panel bubble ink tone frame gutter sfx page spread sketch line art beta "
    "screen speed kana glyph onoma scan raw clean redraw typeset translate "
    "proof read release scanlation chapter volume tank serial weekly monthly "
    "shonen seinen shojo josei manga comic bande dessinee webtoon strip"
).split()


def media_seed(media_ref: str) -> int:
    """Stable 64-bit seed from a media_ref (sha256; no Python hash()
    randomization)."""
    return int.from_bytes(hashlib.sha256(media_ref.encode()).digest()[:8], "little")


# ---------------------------------------------------------------------------
# Page ground truth
# ---------------------------------------------------------------------------


@dataclass
class BlockGT:
    """One synthetic text block: per-line tight quads (4,2) float64 in
    original page coordinates, as draw_textblk returns
    (text_rendering.py:55-128)."""

    lines: np.ndarray                 # (n, 4, 2)
    language: str                     # 'eng' | 'ja'
    vertical: bool
    font_size: float
    detected: bool = True             # YOLO pred box emitted for it
    in_lines_map: bool = True         # lines rendered into the DB shrink map
    conf: float = 0.9
    cls_id: int = 0

    @property
    def bbox(self):
        xs, ys = self.lines[..., 0], self.lines[..., 1]
        return [float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())]


@dataclass
class PageGT:
    page_w: int
    page_h: int
    blocks: list[BlockGT] = field(default_factory=list)
    # (quad (4,2), fill value) regions painted only into the lines_map —
    # low-score blobs exercise the box_thresh gate, tiny blobs the sside gate.
    noise_regions: list = field(default_factory=list)
    # sub-threshold / duplicate YOLO rows beyond the real blocks.
    noise_boxes: list = field(default_factory=list)     # (xyxy, conf, cls_id)
    empty_boxes: list = field(default_factory=list)     # high-conf box over empty area
    bg_level: int = 245
    fg_level: int = 40


def _make_block_lines(rng: np.random.Generator, fs: float, n_lines: int,
                      vertical: bool, angle_deg: float, origin_x: float,
                      origin_y: float) -> np.ndarray:
    """Axis-aligned per-line rects → optional rotation about the block center.
    Horizontal: rows stacked downward; vertical: columns stacked right-to-left
    (manga column order)."""
    quads = []
    gap = fs * rng.uniform(0.3, 1.5)
    if vertical and rng.random() < 0.25:
        gap = fs * rng.uniform(2.2, 3.0)   # exercises the 2·fs split gap
    for i in range(n_lines):
        length = fs * rng.uniform(2.5, 8.0)
        if vertical:
            x1 = origin_x - i * (fs + gap)
            x0 = x1 - fs
            y0, y1 = origin_y, origin_y + length
        else:
            y0 = origin_y + i * (fs + gap)
            y1 = y0 + fs
            x0, x1 = origin_x, origin_x + length
        quads.append([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])
    lines = np.array(quads, dtype=np.float64)
    if angle_deg != 0:
        center = (lines.reshape(-1, 2).min(axis=0) + lines.reshape(-1, 2).max(axis=0)) / 2
        flat = rotate_polygons(center, lines.reshape(-1, 8), angle_deg, to_int=False)
        lines = flat.reshape(-1, 4, 2)
    return lines


@functools.lru_cache(maxsize=2048)
def page_ground_truth(media_ref: str) -> PageGT:
    """Deterministic page layout from the media_ref seed alone.

    Pure function of the ref → safe to memoize; a page is consulted by the
    decode stage, the surrogate head, and (optionally) the refine stage in
    the same task, so the cache removes repeated synthesis.  Consumers never
    mutate the returned GT (they copy/scale into their own buffers)."""
    rng = np.random.default_rng(media_seed(media_ref))
    page_w, page_h = _PAGE_SIZES[rng.choice(len(_PAGE_SIZES), p=_PAGE_SIZE_P)]
    gt = PageGT(page_w=page_w, page_h=page_h,
                bg_level=int(rng.integers(232, 255)),
                fg_level=int(rng.integers(10, 72)))
    u = rng.random()
    if u < 0.08:
        n_blocks = 0
    elif u < 0.92:
        n_blocks = int(rng.integers(1, 9))
    else:
        n_blocks = int(rng.integers(12, 21))   # dense page → skew evidence
    ja_prob = 0.8 if rng.random() < 0.5 else 0.2
    margin = 24.0
    placed: list[list[float]] = []
    for _ in range(n_blocks):
        for _attempt in range(30):
            language = "ja" if rng.random() < ja_prob else "eng"
            vertical = language == "ja" and rng.random() < 0.6
            fs = float(rng.integers(20, 49))
            n_lines = int(rng.integers(1, 7))
            r_ang = rng.random()
            angle = 0.0 if r_ang < 0.7 else float(rng.choice([-5.0, 5.0, -30.0, 30.0]))
            ox = float(rng.uniform(margin + fs * 8, page_w - margin)) if vertical \
                else float(rng.uniform(margin, page_w - margin - fs * 8))
            oy = float(rng.uniform(margin, page_h - margin - fs * 8))
            lines = _make_block_lines(rng, fs, n_lines, vertical, angle, ox, oy)
            xs, ys = lines[..., 0], lines[..., 1]
            bbox = [xs.min(), ys.min(), xs.max(), ys.max()]
            if bbox[0] < margin or bbox[1] < margin or bbox[2] > page_w - margin \
                    or bbox[3] > page_h - margin:
                continue
            pad = 10.0
            padded = [bbox[0] - pad, bbox[1] - pad, bbox[2] + pad, bbox[3] + pad]
            if any(box_intersection_area(padded, p) > 0 for p in placed):
                continue   # collision rejection, same scheme as text_rendering.py:345-360
            placed.append(padded)
            blk = BlockGT(
                lines=lines, language=language, vertical=vertical, font_size=fs,
                detected=rng.random() < 0.88,
                in_lines_map=rng.random() < 0.95,
                conf=float(rng.uniform(0.55, 0.95)),
                cls_id=(2 if rng.random() < 0.05 else (1 if language == "ja" else 0)),
            )
            gt.blocks.append(blk)
            break
    # Detector-noise fixtures (FIXTURES.md §3): sub-threshold YOLO rows,
    # a low-score DB blob, a tiny DB blob, and an empty high-conf box.
    for _ in range(int(rng.integers(0, 4))):
        x = rng.uniform(margin, page_w - 80)
        y = rng.uniform(margin, page_h - 80)
        w, h = rng.uniform(30, 70), rng.uniform(20, 50)
        gt.noise_boxes.append(([x, y, x + w, y + h], float(rng.uniform(0.05, 0.3)),
                               int(rng.integers(0, 3))))
    if rng.random() < 0.5:
        x = rng.uniform(margin, page_w - 120)
        y = rng.uniform(margin, page_h - 60)
        quad = np.array([[x, y], [x + 90, y], [x + 90, y + 34], [x, y + 34]])
        gt.noise_regions.append((quad, 0.45))   # passes binarize 0.3, fails box_thresh 0.6
    if rng.random() < 0.5:
        x = rng.uniform(margin, page_w - 8)
        y = rng.uniform(margin, page_h - 8)
        quad = np.array([[x, y], [x + 1.2, y], [x + 1.2, y + 1.2], [x, y + 1.2]])
        gt.noise_regions.append((quad, 0.95))   # sside < 2 → dropped
    if rng.random() < 0.3:
        x = rng.uniform(margin, page_w - 150)
        y = rng.uniform(margin, page_h - 90)
        ok = True
        cand = [x, y, x + 120, y + 70]
        for blk in gt.blocks:
            if box_intersection_area(cand, blk.bbox) > 0:
                ok = False
                break
        if ok:
            gt.empty_boxes.append((cand, float(rng.uniform(0.5, 0.9))))
    return gt


def render_page(gt: PageGT) -> np.ndarray:
    """Grayscale page image (h, w) uint8: light background, dark filled line
    rects (the sandbox stand-in for glyph rendering,
    text_rendering.py:55-128)."""
    img = np.full((gt.page_h, gt.page_w), gt.bg_level, dtype=np.uint8)
    for blk in gt.blocks:
        for quad in blk.lines:
            fill_convex_poly(img, quad, gt.fg_level)
    return img


# ---------------------------------------------------------------------------
# Interleaved document corpus
# ---------------------------------------------------------------------------


def make_media_ref(doc_id: str, offset: int) -> str:
    return f"page://{doc_id}/{offset}"


def make_corpus(n_docs: int, seed: int = 42) -> pa.Table:
    """Deterministic interleaved doc table (FIXTURES.md §1): per doc 1-24
    spans; ~5% dense docs with a media-heavy long tail (skew evidence)."""
    docs = []
    for i in range(n_docs):
        rng = np.random.default_rng((seed << 32) ^ i)
        doc_id = f"doc-{i:08d}"
        dense = rng.random() < 0.05
        n_spans = int(rng.integers(12, 25)) if dense else int(rng.integers(1, 13))
        p_media = 0.7 if dense else 0.4
        spans = []
        for off in range(n_spans):
            if rng.random() < p_media:
                spans.append({"kind": "media", "text": "",
                              "media_ref": make_media_ref(doc_id, off),
                              "offset": off})
            else:
                n_words = int(rng.integers(3, 31))
                words = [_WORDS[int(k)] for k in rng.integers(0, len(_WORDS), n_words)]
                spans.append({"kind": "text", "text": " ".join(words),
                              "media_ref": "", "offset": off})
        docs.append({"doc_id": doc_id, "spans": spans})
    return pa.Table.from_pylist(docs, schema=DOC_SCHEMA)


def write_corpus(path: str, n_docs: int, seed: int = 42,
                 rows_per_file: int = 2000) -> str:
    """Write the corpus as a directory of Parquet part files (the Lance-table
    stand-in, SURVEY.md §7) so reads parallelize and resume can skip
    finished fragments."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    table = make_corpus(n_docs, seed=seed)
    n_files = max(1, (n_docs + rows_per_file - 1) // rows_per_file)
    for f in range(n_files):
        lo = f * rows_per_file
        hi = min(n_docs, lo + rows_per_file)
        pq.write_table(table.slice(lo, hi - lo), os.path.join(path, f"part-{f:05d}.parquet"))
    return path

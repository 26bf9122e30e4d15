"""The per-page detection chain shared by the Ray pipeline and the oracle.

This is the engine's re-expression of ``TextDetector.__call__``
(inference.py:141-178) as a pure function: backend inference → NMS → DB line
extraction → coordinate unmapping → TextBlock grouping.  Both the distributed
pipeline (ctdray.stages.detect) and the single-process oracle (ctdray.oracle)
call exactly this function, so span equality between them checks the Ray
plumbing (explode / shuffle / splice / ordering under parallelism), while the
unit tests in tests/ check this chain's semantics against the reference's
documented behavior.
"""
from __future__ import annotations

from typing import List

import numpy as np

from .config import DetectorConfig
from .geom import ResizedMaskView, letterbox_params, non_max_suppression
from .represent import extract_lines
from .schema import serialize_line_span
from .textblock import TextBlock, group_output


def infer_page_arrays(detector, media_ref: str, im_h: int, im_w: int,
                      cfg: DetectorConfig,
                      half: bool = False,
                      compact: bool = True) -> tuple[np.ndarray, np.ndarray,
                                                     np.ndarray]:
    """Model-forward half of the per-page chain: raw backend outputs reduced
    to the COMPACT arrays postprocessing actually consumes —

      blks       (n, 5+nc) float32   raw YOLO rows (pre-NMS; tiny)
      mask_crop  (S-dh, S-dw) float  UNet sigmoid map, pad cropped
      lines0     (S-dh, S-dw) float  DB shrink map channel 0, pad cropped

    This is the stage boundary of the SPLIT (prod GPU) layout: the letterbox
    pad region is dropped before anything enters the object store (its values
    are below every threshold by construction — see ``postprocess_page``'s
    zero-pad reconstruction), and ``half=True`` ships the two maps as fp16
    (the maps are sigmoid outputs in [0,1]; fp16's 2^-11 relative step is two
    orders below the coarsest decision threshold, and the YOLO rows — where
    rounding could move an int pixel coordinate — always stay fp32)."""
    size = cfg.input_size
    blks, mask, lines_map = detector.infer(media_ref, im_h, im_w)
    _, new_w, new_h, dw, dh = letterbox_params(im_h, im_w, size)
    b = np.asarray(blks, dtype=np.float32)
    while b.ndim > 2:
        b = b[0]
    m = np.asarray(mask)
    while m.ndim > 2:
        m = m[0]
    l0 = np.asarray(lines_map)
    while l0.ndim > 3:
        l0 = l0[0]
    l0 = l0[0]
    if not compact:
        # Fused layout: nothing is serialized, so hand back VIEWS — the mask
        # crop costs no copy (ResizedMaskView re-bases it) and the shrink map
        # stays full-size so postprocess_page skips the pad reconstruction.
        return b, m[: size - dh, : size - dw], l0
    dt = np.float16 if half else np.float32
    mask_crop = np.ascontiguousarray(m[: size - dh, : size - dw], dtype=dt)
    lines0 = np.ascontiguousarray(l0[: size - dh, : size - dw], dtype=dt)
    return b, mask_crop, lines0


def infer_page_planes(detector, media_ref: str, im_h: int, im_w: int,
                      cfg: DetectorConfig) -> tuple[np.ndarray, np.ndarray,
                                                    np.ndarray, int, int]:
    """Split-layout forward pass returning ``(blks, mask_full, lines0_full,
    crop_h, crop_w)`` — the two FULL-SIZE (S, S) fp32 maps as the backend
    produced them (zero copies here; the codec scans them in place and the
    letterbox pad region never ships — tensorcodec.encode_page_maps) plus
    the un-padded crop extent.  Maps stay fp32 regardless of the wire dtype:
    numpy fp16 kernels are emulated and the codec casts only the stored
    values (tensorcodec module docstring)."""
    size = cfg.input_size
    blks, mask, lines_map = detector.infer(media_ref, im_h, im_w)
    _, new_w, new_h, dw, dh = letterbox_params(im_h, im_w, size)
    b = np.asarray(blks, dtype=np.float32)
    while b.ndim > 2:
        b = b[0]
    m = np.asarray(mask, dtype=np.float32)
    while m.ndim > 2:
        m = m[0]
    l0 = np.asarray(lines_map, dtype=np.float32)
    while l0.ndim > 3:
        l0 = l0[0]
    l0 = l0[0]
    return b, m, l0, size - dh, size - dw


def postprocess_page(blks: np.ndarray, mask_crop: np.ndarray,
                     lines0: np.ndarray, im_h: int, im_w: int,
                     cfg: DetectorConfig,
                     img: np.ndarray | None = None,
                     active_rows: tuple | None = None) -> tuple[List[TextBlock],
                                                                np.ndarray]:
    """Pure-numpy postprocess half (NMS → DB representer → unmapping →
    grouping): needs NO model state, so in the split layout it runs as
    stateless CPU tasks downstream of the (GPU) infer pool.  Inputs are the
    compact arrays of :func:`infer_page_arrays`."""
    size = cfg.input_size
    _, new_w, new_h, dw, dh = letterbox_params(im_h, im_w, size)
    # inference.py:147 — unmapping is a pure per-axis scale because the
    # letterbox pads only bottom/right.
    rr = (im_w / (size - dw), im_h / (size - dh))

    det = non_max_suppression(blks, cfg.conf_thresh, cfg.nms_thresh, cfg.max_det)
    det[:, [0, 2]] *= rr[0]
    det[:, [1, 3]] *= rr[1]
    boxes = det[:, 0:4].astype(np.int32)
    confs = np.round(det[:, 4], 3)
    classes = det[:, 5].astype(np.int32)

    # Zero-pad the shrink map back to (S, S) when it arrived cropped (split
    # layout): bit-identical to running the representer on the uncropped map
    # (the pad was calloc'd zeros — below seg_thresh, and box-score means
    # clip to the same full-map extent).  Fused callers pass the full-size
    # map and skip the copy entirely.
    if lines0.shape == (size, size):
        full0 = np.asarray(lines0, dtype=np.float32)
    else:
        full0 = np.zeros((size, size), dtype=np.float32)
        full0[: lines0.shape[0], : lines0.shape[1]] = lines0
    lines, _scores = extract_lines(full0, cfg, active_rows=active_rows)

    # Un-letterbox: crop the pad, resize to original (inference.py:163-165).
    # Both the uint8 conversion (inference.py:85-99) AND the resize are
    # deferred — group_output samples only rectangular window densities,
    # computed bit-identically on demand (geom.ResizedMaskView, scale255);
    # mask sinks call .full().
    mask_u8 = ResizedMaskView(np.asarray(mask_crop, dtype=np.float32),
                              im_w, im_h, scale255=True)
    if lines.size:
        lines = lines.astype(np.float64)
        lines[..., 0] *= rr[0]
        lines[..., 1] *= rr[1]
        lines = lines.astype(np.int32)
    else:
        lines = []

    blk_list = group_output(boxes, classes, confs, lines, im_w, im_h, mask_u8,
                            img=img)
    return blk_list, mask_u8


def detect_page(detector, media_ref: str, im_h: int, im_w: int,
                cfg: DetectorConfig,
                img: np.ndarray | None = None) -> tuple[List[TextBlock], np.ndarray]:
    """Run the full per-page chain (fused layout: infer + postprocess in one
    call, nothing serialized); returns (reading-ordered blocks, text mask as
    a lazy page-size view — ``.full()`` materializes uint8).
    Passing the decoded page (``img``) additionally samples per-line fg/bg
    font colors into the blocks (O13) — callers that already decoded the
    page get colors for free; the span path stays pixel-free."""
    blks, mask_crop, lines0 = infer_page_arrays(detector, media_ref,
                                                im_h, im_w, cfg, compact=False)
    # Backends that expose their paint rects (surrogate) hand the
    # representer a row band bounding every above-threshold pixel — the
    # threshold/CC scans then skip ~40% of the map on typical pages
    # (band coverage p50 ≈ 0.68).  The split layout's postprocess keeps the
    # full scan: its decoded maps are calloc'd zeros + scatter, whose
    # untouched regions read the shared zero page already.
    rects = getattr(detector, "last_paint_rects", None)
    band = None
    if rects is not None:
        lines_rects = rects[1]
        band = ((min(r[0] for r in lines_rects),
                 max(r[1] for r in lines_rects))
                if lines_rects else (0, 0))
    return postprocess_page(blks, mask_crop, lines0, im_h, im_w, cfg,
                            img=img, active_rows=band)


def doc_out_spans(detector, doc_id: str, spans: list[dict],
                  cfg: DetectorConfig) -> list[dict]:
    """Output span sequence for one document: original spans (order=-1) with
    detected spans spliced after their source media span (FIXTURES.md §4).
    Undecodable media is passed through without detections (poison-pill rows
    degrade, they never crash — SURVEY.md §4).

    Shared by the fused no-shuffle pipeline stage (stages.detect) and the
    single-process oracle (ctdray.oracle); the distributed-vs-oracle span
    equality therefore checks the Ray plumbing (batching, actor pools, the
    dense-doc shuffle path, union ordering) rather than this chain.
    """
    cols = ([], [], [], [], [])
    doc_out_span_columns(detector, doc_id, spans, cfg, cols)
    return [{"kind": k, "text": t, "media_ref": r, "offset": o, "order": d}
            for k, t, r, o, d in zip(*cols)]


def doc_out_span_columns(detector, doc_id: str, spans: list[dict],
                         cfg: DetectorConfig, cols: tuple) -> None:
    """Column form of :func:`doc_out_spans`: appends one document's output
    spans into the parallel ``(kind, text, media_ref, offset, order)`` lists.

    The hot pipeline stages build Arrow arrays from these directly —
    materializing a python dict per span (188k per bench corpus) was ~15% of
    the whole fused stage; the oracle keeps the dict form via the wrapper so
    the span contract is checked against the identical chain."""
    from .sources.media import decode_page

    kind_l, text_l, ref_l, off_l, ord_l = cols
    for span in spans:
        kind_l.append(span["kind"])
        text_l.append(span["text"])
        ref_l.append(span["media_ref"])
        off_l.append(span["offset"])
        ord_l.append(-1)
        if span["kind"] != "media":
            continue
        ref = span["media_ref"]
        try:
            img = decode_page(ref)
        except ValueError:
            continue
        blocks, _ = detect_page(detector, ref, img.shape[0], img.shape[1], cfg)
        off = span["offset"]
        for order, text in page_line_spans(blocks):
            kind_l.append("text_line")
            text_l.append(text)
            ref_l.append(ref)
            off_l.append(off)
            ord_l.append(order)


def page_line_spans(blk_list: List[TextBlock]) -> list[tuple[int, str]]:
    """Flatten reading-ordered blocks into (order, canonical text) pairs —
    one per detected line (FIXTURES.md §4; line serialization mirrors the
    reference's line-*.txt rows, inference.py:61-65)."""
    out = []
    order = 0
    for blk in blk_list:
        for line in blk.lines:
            quad8 = np.asarray(line, dtype=np.int64).reshape(8)
            out.append((order, serialize_line_span(
                quad8, blk.language, blk.vertical, blk.angle, blk.font_size)))
            order += 1
    return out

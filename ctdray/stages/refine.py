"""Mask-refinement stage — the engine's ``mask-<name>.png`` sink path
(inference.py:35,70,174-176) as an optional pixel-consuming stage.

Unlike the span path, this stage must hold the decoded page AND the full
page-size predicted mask, so it is its own ``map_batches`` stage (scaled
independently; SURVEY.md §7 stateless-vs-stateful note) and only compact
outputs (encoded mask + counts) leave it.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import PipelineConfig
from ..detect_core import detect_page
from ..schema import MASK_SCHEMA
from ..sources.media import decode_page, encode_pgm
from ..sources.png import encode_png
from ..surrogate import make_detector
from ..textmask import (REFINEMASK_ANNOTATION, REFINEMASK_INPAINT,
                        refine_mask, refine_undetected_mask)

_TASK_DETECTORS: dict = {}


def refine_masks_task(batch: pa.Table, cfg=None,
                      backend: str = "surrogate") -> pa.Table:
    """Page rows (doc_id, media_offset, media_ref) → refined-mask rows
    (schema.MASK_SCHEMA).  Runs detect + K1-K5 refinement per page."""
    cfg = cfg or PipelineConfig()
    det_cfg = cfg.detector
    key = (backend, det_cfg)
    det = _TASK_DETECTORS.get(key)
    if det is None:
        det = _TASK_DETECTORS[key] = make_detector(backend, det_cfg)
    mode = REFINEMASK_ANNOTATION if cfg.refine_mode == "annotation" \
        else REFINEMASK_INPAINT
    rows = []
    for doc_id, off, ref in zip(batch.column("doc_id").to_pylist(),
                                batch.column("media_offset").to_pylist(),
                                batch.column("media_ref").to_pylist()):
        try:
            img = decode_page(ref)
        except ValueError:
            continue                       # poison pill degrades, never crashes
        blocks, mask_view = detect_page(det, ref, img.shape[0], img.shape[1],
                                        det_cfg)
        pred = mask_view.full()
        refined = refine_mask(img, pred, blocks, refine_mode=mode)
        if cfg.keep_undetected_mask:
            refined = refine_undetected_mask(img, pred, refined, blocks,
                                             refine_mode=mode)
        # PNG by default — the reference's actual mask sink format
        # (mask-<name>.png, inference.py:70); PGM remains selectable.
        enc = encode_png if cfg.mask_format == "png" else encode_pgm
        rows.append({
            "doc_id": doc_id, "media_offset": int(off), "media_ref": ref,
            "mask": enc(refined),
            "mask_h": int(refined.shape[0]), "mask_w": int(refined.shape[1]),
            "fg_pixels": int((refined > 0).sum()),
            "n_blocks": len(blocks),
        })
    if not rows:
        return MASK_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=MASK_SCHEMA)


def annotate_pages_task(batch: pa.Table, cfg=None,
                        backend: str = "surrogate") -> pa.Table:
    """Page rows → annotation rows (schema.ANNOTATION_SCHEMA): the detected
    block structs and the page's saved mask side by side — the engine's
    model2annotations output shape (per-image JSON + mask-<name>.png,
    inference.py:61-70).  The saved mask is the REFINED mask, matching what
    the reference writes; resuming from this row re-refines from it exactly
    like traverse_by_dict (inference.py:194-195)."""
    from ..schema import ANNOTATION_SCHEMA

    cfg = cfg or PipelineConfig()
    det_cfg = cfg.detector
    key = (backend, det_cfg)
    det = _TASK_DETECTORS.get(key)
    if det is None:
        det = _TASK_DETECTORS[key] = make_detector(backend, det_cfg)
    mode = REFINEMASK_ANNOTATION if cfg.refine_mode == "annotation" \
        else REFINEMASK_INPAINT
    enc = encode_png if cfg.mask_format == "png" else encode_pgm
    rows = []
    for doc_id, off, ref in zip(batch.column("doc_id").to_pylist(),
                                batch.column("media_offset").to_pylist(),
                                batch.column("media_ref").to_pylist()):
        try:
            img = decode_page(ref)
        except ValueError:
            continue                       # poison pill degrades, never crashes
        blocks, mask_view = detect_page(det, ref, img.shape[0], img.shape[1],
                                        det_cfg)
        pred = mask_view.full()
        refined = refine_mask(img, pred, blocks, refine_mode=mode)
        if cfg.keep_undetected_mask:
            refined = refine_undetected_mask(img, pred, refined, blocks,
                                             refine_mode=mode)
        rows.append({
            "doc_id": doc_id, "media_offset": int(off), "media_ref": ref,
            "mask": enc(refined),
            "mask_h": int(refined.shape[0]), "mask_w": int(refined.shape[1]),
            "blocks": [blk.to_struct(order=bi)
                       for bi, blk in enumerate(blocks)],
        })
    if not rows:
        return ANNOTATION_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=ANNOTATION_SCHEMA)


def refine_from_annotations_task(batch: pa.Table, cfg=None) -> pa.Table:
    """Annotation rows → refined-mask rows (schema.MASK_SCHEMA) WITHOUT any
    detector: decode the page, decode the saved mask, hydrate the block
    structs, and re-run K1-K5 refinement — the traverse_by_dict resume path
    (inference.py:180-200; SURVEY.md §3.2: \"everything needed to resume
    refinement lives in the JSON blocks + mask\")."""
    from ..stages.multimodal import decode_image
    from ..textblock import TextBlock

    cfg = cfg or PipelineConfig()
    mode = REFINEMASK_ANNOTATION if cfg.refine_mode == "annotation" \
        else REFINEMASK_INPAINT
    enc = encode_png if cfg.mask_format == "png" else encode_pgm
    rows = []
    for doc_id, off, ref, mask_bytes, blocks_structs in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("media_offset").to_pylist(),
            batch.column("media_ref").to_pylist(),
            batch.column("mask").to_pylist(),
            batch.column("blocks").to_pylist()):
        try:
            img = decode_page(ref)
            saved = decode_image(mask_bytes)
        except (ValueError, NotImplementedError):
            continue                       # poison pill degrades, never crashes
        blocks = [TextBlock.from_struct(d) for d in blocks_structs]
        refined = refine_mask(img, saved, blocks, refine_mode=mode)
        if cfg.keep_undetected_mask:
            refined = refine_undetected_mask(img, saved, refined, blocks,
                                             refine_mode=mode)
        rows.append({
            "doc_id": doc_id, "media_offset": int(off), "media_ref": ref,
            "mask": enc(refined),
            "mask_h": int(refined.shape[0]), "mask_w": int(refined.shape[1]),
            "fg_pixels": int((refined > 0).sum()),
            "n_blocks": len(blocks),
        })
    if not rows:
        return MASK_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=MASK_SCHEMA)

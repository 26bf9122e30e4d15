"""Detect + extract stage — the actor-pool heart of the pipeline.

The reference loads weights once and loops images sequentially
(inference.py:24-28); here the detector is a callable CLASS for
``map_batches(..., concurrency=N)``: backend construction (weights / lookup
tables) happens once per actor in ``__init__``, per-batch work in
``__call__`` (SURVEY.md §2.4 A1).

Fused mode (default, CPU backends): the per-page model maps
(~12 MB/page at input 1024) are consumed by NMS/representer/grouping inside
the same call and never enter the object store — only compact span/block rows
cross the stage boundary.

Split mode (prod GPU layout; ``PipelineConfig.detect_layout='split'``): the
detector actor (:class:`DetectInfer`, ``num_gpus`` plumbed through
``infer_num_gpus``) emits the raw per-page tensors — YOLO rows fp32, the two
maps pad-cropped and optionally fp16 (schema.TENSOR_PAGE_SCHEMA) — and a
separate STATELESS CPU task pool (:func:`postprocess_task`) runs
NMS/representer/grouping.  The GPU pool then does nothing but forward passes
(its batch is the GPU micro-batch, not the postprocess batch), while the
postprocess scales independently on cheap CPU tasks; ~4 MB/page (fp16 maps)
crosses the object store instead of ~12 MB of raw fp32 model output.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import PipelineConfig
from ..detect_core import (detect_page, doc_out_span_columns,
                           infer_page_planes, page_line_spans,
                           postprocess_page)
from ..tensorcodec import decode_page_maps, encode_page_maps
from ..schema import (BLOCK_SCHEMA, DETECTED_SPAN_SCHEMA, OUT_DOC_SCHEMA,
                      OUT_SPAN_STRUCT, TENSOR_DOC_SCHEMA, TENSOR_PAGE_SCHEMA)
from ..surrogate import make_detector


def _spliced_docs_table(doc_ids: list, cols: tuple,
                        list_offsets: list) -> pa.Table:
    """(doc_ids, span column lists, per-doc list offsets) → OUT_DOC_SCHEMA
    table, built column-wise (no per-span python dicts)."""
    struct = pa.StructArray.from_arrays(
        [pa.array(cols[0], pa.string()),
         pa.array(cols[1], pa.string()),
         pa.array(cols[2], pa.string()),
         pa.array(cols[3], pa.int32()),
         pa.array(cols[4], pa.int32())],
        fields=list(OUT_SPAN_STRUCT))
    spans = pa.ListArray.from_arrays(pa.array(list_offsets, pa.int32()),
                                     struct)
    return pa.table({"doc_id": pa.array(doc_ids, pa.string()),
                     "spans": spans})


class _BlockCols:
    """Columnar accumulator for BLOCK_SCHEMA rows — parallel scalar lists
    plus the per-block struct dicts, assembled with one pa.array per column
    (``Table.from_pylist`` re-infers the nested block type per row; the
    scalar columns dominate the row count).  Shared by the fused blocks
    stage and the split-layout postprocess."""

    __slots__ = ("doc", "off", "ref", "h", "w", "blk")

    def __init__(self):
        self.doc: list = []
        self.off: list = []
        self.ref: list = []
        self.h: list = []
        self.w: list = []
        self.blk: list = []

    def add_page(self, doc_id, off: int, ref, h: int, w: int, blocks):
        for bi, blk in enumerate(blocks):
            self.doc.append(doc_id)
            self.off.append(off)
            self.ref.append(ref)
            self.h.append(h)
            self.w.append(w)
            self.blk.append(blk.to_struct(order=bi))

    def table(self) -> pa.Table:
        if not self.doc:
            return BLOCK_SCHEMA.empty_table()
        return pa.table(
            {"doc_id": pa.array(self.doc, pa.string()),
             "media_offset": pa.array(self.off, pa.int32()),
             "media_ref": pa.array(self.ref, pa.string()),
             "im_h": pa.array(self.h, pa.int32()),
             "im_w": pa.array(self.w, pa.int32()),
             "block": pa.array(self.blk, BLOCK_SCHEMA.field("block").type)},
            schema=BLOCK_SCHEMA)


def detect_splice_doc_task(batch: pa.Table, cfg=None,
                           backend: str = "surrogate") -> pa.Table:
    """Stateless-task variant of :class:`DetectSpliceDoc` (see
    :func:`detect_extract_task` for the compute-mode rationale)."""
    cfg = cfg or PipelineConfig()
    key = (backend, cfg.detector)
    det = _TASK_DETECTORS.get(key)
    if det is None:
        det = _TASK_DETECTORS[key] = make_detector(backend, cfg.detector)
    doc_ids = batch.column("doc_id").to_pylist()
    if not doc_ids:
        return OUT_DOC_SCHEMA.empty_table()
    cols: tuple = ([], [], [], [], [])
    offsets = [0]
    for doc_id, spans in zip(doc_ids, batch.column("spans").to_pylist()):
        doc_out_span_columns(det, doc_id, spans, cfg.detector, cols)
        offsets.append(len(cols[0]))
    return _spliced_docs_table(doc_ids, cols, offsets)


class DetectSpliceDoc:
    """Actor: whole-document rows → spliced output documents — the
    shuffle-free fast path.

    A document's pages are processed inside one task and the span splice
    happens in-place, so for typical documents NOTHING crosses an exchange:
    read → this stage → sink.  Docs with a pathological number of media spans
    (the skew tail) are routed by the pipeline builder to the page-explode +
    ``groupby(doc_id)`` path instead, so one dense document can never make a
    task unbounded (SURVEY.md §4 skew row).  Weights load once per actor.
    """

    def __init__(self, cfg: PipelineConfig | None = None,
                 backend: str = "surrogate", model_path: str | None = None):
        self.cfg = cfg or PipelineConfig()
        self.det_cfg = self.cfg.detector
        self.detector = make_detector(backend, self.det_cfg, model_path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        if not doc_ids:
            return OUT_DOC_SCHEMA.empty_table()
        cols: tuple = ([], [], [], [], [])
        offsets = [0]
        for doc_id, spans in zip(doc_ids, batch.column("spans").to_pylist()):
            doc_out_span_columns(self.detector, doc_id, spans, self.det_cfg,
                                 cols)
            offsets.append(len(cols[0]))
        return _spliced_docs_table(doc_ids, cols, offsets)


_TASK_DETECTORS: dict = {}


def detect_extract_task(batch: pa.Table, cfg=None, output: str = "spans",
                        backend: str = "surrogate") -> pa.Table:
    """Stateless-task variant of :class:`DetectExtract` for low-volume
    branches (the dense-doc skew tail in the hybrid pipeline).  Unlike an
    actor pool it reserves nothing up front — an empty branch costs zero and
    a busy cluster schedules it opportunistically — while the detector is
    still constructed once per worker process via a module-level cache.
    On a GPU cluster the tail gets its own small fractional-GPU pool instead;
    this path is the CPU-surrogate layout."""
    cfg = cfg or PipelineConfig()
    key = (backend, cfg.detector)
    det = _TASK_DETECTORS.get(key)
    if det is None:
        det = _TASK_DETECTORS[key] = make_detector(backend, cfg.detector)
    worker = DetectExtract.__new__(DetectExtract)
    worker.cfg = cfg
    worker.det_cfg = cfg.detector
    worker.output = output
    worker.detector = det
    return worker(batch)


class DetectExtract:
    """Actor: decoded page rows → detected span rows or block rows.

    ``output``: 'spans' (schema.DETECTED_SPAN_SCHEMA) or 'blocks'
    (schema.BLOCK_SCHEMA).  Every output row is self-contained (reading order
    baked in) so downstream stages stay stateless no matter how Ray re-chunks
    blocks.
    """

    def __init__(self, cfg: PipelineConfig | None = None, output: str = "spans",
                 backend: str = "surrogate", model_path: str | None = None):
        self.cfg = cfg or PipelineConfig()
        self.det_cfg = self.cfg.detector
        self.output = output
        # Weights / state loaded ONCE per actor.
        self.detector = make_detector(backend, self.det_cfg, model_path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        offsets = batch.column("media_offset").to_pylist()
        refs = batch.column("media_ref").to_pylist()
        hs = batch.column("im_h").to_pylist()
        ws = batch.column("im_w").to_pylist()
        oks = batch.column("decode_ok").to_pylist()
        if self.output == "blocks":
            cols = _BlockCols()
            for doc_id, off, ref, h, w, ok in zip(doc_ids, offsets, refs,
                                                  hs, ws, oks):
                if not ok:
                    continue
                # Block rows carry fg/bg font colors (O13) — sample from the
                # decoded page; the span path stays pixel-free.
                from ..sources.media import decode_page
                try:
                    img = decode_page(ref)
                except ValueError:
                    img = None
                blocks, _mask = detect_page(self.detector, ref, int(h),
                                            int(w), self.det_cfg, img=img)
                cols.add_page(doc_id, int(off), ref, int(h), int(w), blocks)
            return cols.table()
        # Span path: columnar build (same shape as _spliced_docs_table).
        c_doc: list = []
        c_off: list = []
        c_text: list = []
        c_ref: list = []
        c_ord: list = []
        for doc_id, off, ref, h, w, ok in zip(doc_ids, offsets, refs,
                                              hs, ws, oks):
            if not ok:
                continue
            blocks, _mask = detect_page(self.detector, ref, int(h), int(w),
                                        self.det_cfg)
            for order, text in page_line_spans(blocks):
                c_doc.append(doc_id)
                c_off.append(int(off))
                c_text.append(text)
                c_ref.append(ref)
                c_ord.append(order)
        if not c_doc:
            return DETECTED_SPAN_SCHEMA.empty_table()
        return pa.table(
            {"doc_id": pa.array(c_doc, pa.string()),
             "offset": pa.array(c_off, pa.int32()),
             "kind": pa.array(["text_line"] * len(c_doc), pa.string()),
             "text": pa.array(c_text, pa.string()),
             "media_ref": pa.array(c_ref, pa.string()),
             "order": pa.array(c_ord, pa.int32())},
            schema=DETECTED_SPAN_SCHEMA)


def _infer_page_payload(detector, det_cfg, ref: str, im_h: int, im_w: int,
                        half: bool) -> dict:
    """One page's forward pass reduced to the serialized tensor payload —
    the shared body of :class:`DetectInfer` (page rows) and
    :class:`DetectInferDoc` (doc rows).  ``media_offset`` is the caller's.

    Maps stay fp32 through the forward pass and the codec scan (numpy fp16
    kernels are emulated, ~3 ms/page slower end-to-end); ``half`` only
    selects the codec's STORE dtype, so the fp16 cast touches the shipped
    values alone and postprocess always decodes back to fp32."""
    blks, m_full, l0_full, crop_h, crop_w = infer_page_planes(
        detector, ref, int(im_h), int(im_w), det_cfg)
    mode, runs, vals = encode_page_maps(
        (m_full, l0_full), crop_h, crop_w,
        store_dtype=np.float16 if half else None,
        # Backends that know where they wrote (surrogate painter) hand the
        # codec its run table for free; prod backends without the attr get
        # the full nonzero scan (tensorcodec.encode_page_maps).
        paint_rects=getattr(detector, "last_paint_rects", None))
    return {
        "media_ref": ref, "im_h": int(im_h), "im_w": int(im_w),
        "blks": blks.tobytes(), "blks_w": int(blks.shape[1]),
        "maps": vals, "maps_runs": runs, "maps_mode": mode,
        "map_h": int(crop_h), "map_w": int(crop_w),
        "half": bool(half),
    }


def _decode_page_payload(row: dict) -> tuple[np.ndarray, np.ndarray,
                                             np.ndarray, tuple | None]:
    """Inverse of :func:`_infer_page_payload`: payload dict → the
    (blks, mask_crop, lines0_full, lines_band) postprocess_page consumes.
    Both maps decode in ONE codec call into a full-size (2, S, S) buffer —
    the shrink map goes downstream full-size exactly like the fused path
    (postprocess_page skips its pad reconstruction), the mask as a crop
    view; fp16 exists only in the stored bytes (tensorcodec docstring).

    ``lines_band``: when the shrink plane shipped SPARSE, its run table
    already bounds every nonzero pixel, so the representer's row band
    (detect_core.postprocess_page ``active_rows``) falls out for free —
    the split layout gets the same banded threshold/CC scans as the fused
    path without shipping anything extra.  Dense-mode planes return None
    (full scan)."""
    store = np.float16 if row["half"] else np.float32
    blks = np.frombuffer(row["blks"], dtype=np.float32) \
        .reshape(-1, max(1, row["blks_w"]))
    maps = decode_page_maps(row["maps_mode"], row["maps_runs"], row["maps"],
                            row["map_h"], row["map_w"], store,
                            out_dtype=np.float32)
    band = None
    if row["maps_mode"] & 0b10:        # shrink plane shipped sparse
        size = maps.shape[-1]
        plane_n = size * size
        runs = np.frombuffer(row["maps_runs"], dtype=np.int32).reshape(-1, 2)
        p1 = runs[runs[:, 0] >= plane_n]
        band = ((int(p1[0, 0] - plane_n) // size,
                 int(p1[-1, 1] - 1 - plane_n) // size + 1)
                if len(p1) else (0, 0))
    return blks, maps[0, : row["map_h"], : row["map_w"]], maps[1], band


class DetectInfer:
    """Split-layout INFER actor: decoded page rows → raw tensor rows
    (schema.TENSOR_PAGE_SCHEMA).  Holds the only model state in the split
    pipeline — on a GPU cluster the builder gives this pool
    ``num_gpus=cfg.infer_num_gpus`` per actor and sizes ``concurrency`` to
    the fleet's GPU count, so every GPU does nothing but forward passes;
    in-sandbox the surrogate backend exercises the identical plumbing on CPU.

    ``half`` ships the two maps fp16 (halves the object-store bytes per page;
    detect_core.infer_page_arrays documents why that is decision-safe).
    Undecodable pages are dropped here exactly as in the fused stage."""

    def __init__(self, cfg: PipelineConfig | None = None,
                 backend: str = "surrogate", model_path: str | None = None,
                 half: bool | None = None):
        self.cfg = cfg or PipelineConfig()
        self.det_cfg = self.cfg.detector
        self.half = self.cfg.half_maps if half is None else half
        self.detector = make_detector(backend, self.det_cfg, model_path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for doc_id, off, ref, h, w, ok in zip(
                batch.column("doc_id").to_pylist(),
                batch.column("media_offset").to_pylist(),
                batch.column("media_ref").to_pylist(),
                batch.column("im_h").to_pylist(),
                batch.column("im_w").to_pylist(),
                batch.column("decode_ok").to_pylist()):
            if not ok:
                continue
            payload = _infer_page_payload(self.detector, self.det_cfg, ref,
                                          int(h), int(w), self.half)
            payload["doc_id"] = doc_id
            payload["media_offset"] = int(off)
            rows.append(payload)
        if not rows:
            return TENSOR_PAGE_SCHEMA.empty_table()
        # Columnar build: one pa.array per field (the large_binary map
        # payloads dominate the row — per-row dict assembly would copy each
        # through Arrow's struct-inference path).
        return pa.table(
            {f.name: pa.array([r[f.name] for r in rows], f.type)
             for f in TENSOR_PAGE_SCHEMA},
            schema=TENSOR_PAGE_SCHEMA)


def detect_infer_task(batch: pa.Table, cfg=None, backend: str = "surrogate",
                      half: bool | None = None) -> pa.Table:
    """Stateless-task variant of :class:`DetectInfer` for CPU-substrate
    split layouts (``infer_num_gpus == 0``): the detector comes from the
    per-process cache, so the stage reserves nothing and Ray balances infer
    and postprocess tasks over one pool — an actor pool would pin CPUs to
    the infer leg whether busy or not.  GPU clusters keep the pool (weights
    on-device once per actor, num_gpus reserved)."""
    cfg = cfg or PipelineConfig()
    key = (backend, cfg.detector)
    det = _TASK_DETECTORS.get(key)
    if det is None:
        det = _TASK_DETECTORS[key] = make_detector(backend, cfg.detector)
    worker = DetectInfer.__new__(DetectInfer)
    worker.cfg = cfg
    worker.det_cfg = cfg.detector
    worker.half = cfg.half_maps if half is None else half
    worker.detector = det
    return worker(batch)


def detect_infer_doc_task(batch: pa.Table, cfg=None,
                          backend: str = "surrogate",
                          half: bool | None = None) -> pa.Table:
    """Stateless-task variant of :class:`DetectInferDoc` (same rationale as
    :func:`detect_infer_task`)."""
    cfg = cfg or PipelineConfig()
    key = (backend, cfg.detector)
    det = _TASK_DETECTORS.get(key)
    if det is None:
        det = _TASK_DETECTORS[key] = make_detector(backend, cfg.detector)
    worker = DetectInferDoc.__new__(DetectInferDoc)
    worker.cfg = cfg
    worker.det_cfg = cfg.detector
    worker.half = cfg.half_maps if half is None else half
    worker.detector = det
    return worker(batch)


class DetectInferDoc:
    """Split-layout INFER actor, DOC-CARRYING variant: whole-document rows →
    tensor-doc rows (schema.TENSOR_DOC_SCHEMA).

    The page-level :class:`DetectInfer` forces every document through a
    ``groupby(doc_id)`` splice downstream; carrying the document through the
    boundary instead lets :func:`postprocess_doc_task` splice in place — the
    split layout's normal path then has ZERO shuffles, exactly like the fused
    pipeline, and the groupby barrier carries only the dense skew tail
    (routed away by the same ``dense_media_threshold`` hybrid).  The infer
    unit becomes a document (~2 pages typical; the tail's pathological docs
    never reach this pool), which on a GPU cluster still keeps the
    accelerator fed page-at-a-time inside the loop while original TEXT spans
    ride along as compact strings next to the encoded maps.

    Undecodable media yields no page payload — the postprocess walk matches
    payloads by ``media_offset`` and passes the span through untouched
    (poison-pill contract, SURVEY.md §4)."""

    def __init__(self, cfg: PipelineConfig | None = None,
                 backend: str = "surrogate", model_path: str | None = None,
                 half: bool | None = None):
        self.cfg = cfg or PipelineConfig()
        self.det_cfg = self.cfg.detector
        self.half = self.cfg.half_maps if half is None else half
        self.detector = make_detector(backend, self.det_cfg, model_path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.media import decode_page

        rows: list[dict] = []
        for doc_id, spans in zip(batch.column("doc_id").to_pylist(),
                                 batch.column("spans").to_pylist()):
            pages: list[dict] = []
            for span in spans:
                if span["kind"] != "media":
                    continue
                try:
                    img = decode_page(span["media_ref"])
                except ValueError:
                    continue
                payload = _infer_page_payload(
                    self.detector, self.det_cfg, span["media_ref"],
                    img.shape[0], img.shape[1], self.half)
                payload["media_offset"] = int(span["offset"])
                pages.append(payload)
            rows.append({"doc_id": doc_id, "spans": spans, "pages": pages})
        if not rows:
            return TENSOR_DOC_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=TENSOR_DOC_SCHEMA)


def postprocess_doc_task(batch: pa.Table, cfg=None) -> pa.Table:
    """Split-layout POSTPROCESS, doc-carrying variant: tensor-doc rows →
    spliced output documents (schema.OUT_DOC_SCHEMA).

    Pure numpy, stateless — the split twin of detect_core.doc_out_spans: the
    splice happens here, in the same task that postprocesses the document's
    pages, so nothing downstream needs a shuffle."""
    cfg = cfg or PipelineConfig()
    det_cfg = cfg.detector
    doc_ids: list = []
    cols: tuple = ([], [], [], [], [])
    offsets = [0]
    kind_l, text_l, ref_l, off_l, ord_l = cols
    for row in batch.to_pylist():
        doc_ids.append(row["doc_id"])
        payloads = {p["media_offset"]: p for p in row["pages"]}
        # Contract: media-span offsets are unique within a document (the
        # interleave builder assigns them sequentially), so the dict keying
        # cannot collapse pages.  Guarded because a malformed doc with
        # duplicate offsets would otherwise silently drop payloads where the
        # fused path processes each span independently.
        assert len(payloads) == len(row["pages"]), \
            f"duplicate media_offset in doc {row['doc_id']!r}"
        for span in row["spans"]:
            kind_l.append(span["kind"])
            text_l.append(span["text"])
            ref_l.append(span["media_ref"])
            off_l.append(span["offset"])
            ord_l.append(-1)
            if span["kind"] != "media":
                continue
            p = payloads.get(span["offset"])
            if p is None:        # undecodable page: span passes through
                continue
            blks, mask_crop, lines0, band = _decode_page_payload(p)
            blocks, _mask = postprocess_page(blks, mask_crop, lines0,
                                             p["im_h"], p["im_w"], det_cfg,
                                             active_rows=band)
            for order, text in page_line_spans(blocks):
                kind_l.append("text_line")
                text_l.append(text)
                ref_l.append(span["media_ref"])
                off_l.append(span["offset"])
                ord_l.append(order)
        offsets.append(len(kind_l))
    if not doc_ids:
        return OUT_DOC_SCHEMA.empty_table()
    return _spliced_docs_table(doc_ids, cols, offsets)


def postprocess_task(batch: pa.Table, cfg=None, output: str = "spans") -> pa.Table:
    """Split-layout POSTPROCESS stage: tensor rows → detected span/block rows.

    Pure numpy — needs no detector, no weights, no per-worker state, so it
    runs as plain stateless tasks that scale independently of the (GPU) infer
    pool and cost nothing when idle."""
    cfg = cfg or PipelineConfig()
    det_cfg = cfg.detector
    if output == "blocks":
        cols = _BlockCols()
        for r in batch.to_pylist():
            doc_id, off, ref = r["doc_id"], r["media_offset"], r["media_ref"]
            h, w = r["im_h"], r["im_w"]
            blks, mask_crop, lines0, band = _decode_page_payload(r)
            # Block rows carry fg/bg font colors (O13) — sampled from the
            # page, decoded HERE on the cheap CPU side so the GPU pool never
            # touches pixels twice.
            from ..sources.media import decode_page
            try:
                img = decode_page(ref)
            except ValueError:
                img = None
            blocks, _mask = postprocess_page(blks, mask_crop, lines0,
                                             int(h), int(w), det_cfg, img=img,
                                             active_rows=band)
            cols.add_page(doc_id, int(off), ref, int(h), int(w), blocks)
        return cols.table()
    c_doc: list = []
    c_off: list = []
    c_text: list = []
    c_ref: list = []
    c_ord: list = []
    for r in batch.to_pylist():
        blks, mask_crop, lines0, band = _decode_page_payload(r)
        blocks, _mask = postprocess_page(blks, mask_crop, lines0,
                                         int(r["im_h"]), int(r["im_w"]),
                                         det_cfg, active_rows=band)
        off = int(r["media_offset"])
        for order, text in page_line_spans(blocks):
            c_doc.append(r["doc_id"])
            c_off.append(off)
            c_text.append(text)
            c_ref.append(r["media_ref"])
            c_ord.append(order)
    if not c_doc:
        return DETECTED_SPAN_SCHEMA.empty_table()
    return pa.table(
        {"doc_id": pa.array(c_doc, pa.string()),
         "offset": pa.array(c_off, pa.int32()),
         "kind": pa.array(["text_line"] * len(c_doc), pa.string()),
         "text": pa.array(c_text, pa.string()),
         "media_ref": pa.array(c_ref, pa.string()),
         "order": pa.array(c_ord, pa.int32())},
        schema=DETECTED_SPAN_SCHEMA)

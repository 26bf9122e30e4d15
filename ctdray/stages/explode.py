"""Explode document rows into per-span / per-page rows — vectorized Arrow.

The reference iterates a driver-side file list (inference.py:25-28); here the
corpus is rows, and page extraction is a zero-copy Arrow kernel
(`list_flatten` + `list_parent_indices`) inside ``map_batches`` — no Python
per-row work.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def explode_media_spans(batch: pa.Table) -> pa.Table:
    """Doc rows → one row per media span (schema.PAGE_SCHEMA).

    Page rows are tiny (three scalars); pixels are fetched later, inside the
    decode/detect stages, so the explode shuffle-free fan-out never carries
    image bytes.
    """
    spans = batch.column("spans").combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans)
    doc_ids = pc.take(batch.column("doc_id"), parents)
    is_media = pc.equal(flat.field("kind"), "media")
    out = pa.table({
        "doc_id": doc_ids,
        "media_offset": flat.field("offset"),
        "media_ref": flat.field("media_ref"),
    })
    return out.filter(is_media)


def explode_all_spans(batch: pa.Table) -> pa.Table:
    """Doc rows → flat span rows for ALL original spans with order=-1
    (pre-splice representation, schema.DETECTED_SPAN_SCHEMA-compatible)."""
    spans = batch.column("spans").combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans)
    doc_ids = pc.take(batch.column("doc_id"), parents)
    n = len(flat)
    return pa.table({
        "doc_id": doc_ids,
        "offset": flat.field("offset"),
        "kind": flat.field("kind"),
        "text": flat.field("text"),
        "media_ref": flat.field("media_ref"),
        "order": pa.array([-1] * n, type=pa.int32()),
    })

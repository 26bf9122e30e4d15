"""Fixed Arrow schemas for the engine's tables.

The reference has no schema system (duck-typed dicts + loose ndarrays,
SURVEY.md §1); here every table is declared once and carried end-to-end by
Ray Data.  The input shape is dictated by BASELINE.json ``input_hint``:

  doc_id: string
  spans:  list<struct<kind: string, text: string, media_ref: string, offset: int32>>

``kind`` ∈ {'text','media'} on input; output adds 'text_line' spans spliced
after their source media span (FIXTURES.md §4).
"""
from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Input / output document tables (Lance-shaped; Parquet stand-in in-sandbox)
# ---------------------------------------------------------------------------

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

DOC_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# Output spans additionally carry the reading order assigned by the per-page
# sort (reference: utils/textblock.py:267-300); original spans have order=-1.
OUT_SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
        pa.field("order", pa.int32()),
    ]
)

OUT_DOC_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(OUT_SPAN_STRUCT)),
    ]
)

# Flat (exploded) span rows — the shuffle-friendly representation: one row per
# span; ``seq`` is the final position in the document's span sequence.
FLAT_SPAN_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("seq", pa.int32()),
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
        pa.field("order", pa.int32()),
    ]
)

# ---------------------------------------------------------------------------
# Page rows (after exploding media spans; one row per page image)
# ---------------------------------------------------------------------------

PAGE_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_offset", pa.int32()),
        pa.field("media_ref", pa.string()),
    ]
)

# ---------------------------------------------------------------------------
# Block struct — the TextBlock record type (reference: utils/textblock.py:12-86)
# restricted to the fields inference actually fills (SURVEY.md §1.3).
# ---------------------------------------------------------------------------

BLOCK_STRUCT = pa.struct(
    [
        pa.field("xyxy", pa.list_(pa.int32(), 4)),
        pa.field("lines", pa.list_(pa.list_(pa.int32(), 8))),
        pa.field("language", pa.string()),
        pa.field("vertical", pa.bool_()),
        pa.field("font_size", pa.float32()),
        pa.field("angle", pa.int32()),
        pa.field("distance", pa.list_(pa.float64())),
        pa.field("alignment", pa.int32()),
        pa.field("fg_rgb", pa.list_(pa.int32(), 3)),
        pa.field("bg_rgb", pa.list_(pa.int32(), 3)),
        pa.field("line_spacing", pa.float32()),
        pa.field("order", pa.int32()),
    ]
)

BLOCK_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_offset", pa.int32()),
        pa.field("media_ref", pa.string()),
        pa.field("im_h", pa.int32()),
        pa.field("im_w", pa.int32()),
        pa.field("block", BLOCK_STRUCT),
    ]
)

# Detected text_line span rows (pre-splice).
DETECTED_SPAN_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("offset", pa.int32()),      # parent media span's offset
        pa.field("kind", pa.string()),       # always 'text_line'
        pa.field("text", pa.string()),       # canonical serialization, FIXTURES.md §4
        pa.field("media_ref", pa.string()),
        pa.field("order", pa.int32()),       # reading order within the page
    ]
)

# Split-layout intermediate rows (prod GPU layout, stages/detect.py): the raw
# per-page model outputs crossing the infer→postprocess stage boundary.
# ``blks`` is (n, blks_w) float32 YOLO rows; the page's TWO maps (UNet mask +
# DB shrink channel) are codec'd TOGETHER — one runs table, one values
# buffer (tensorcodec.encode_page_maps; map_h/map_w = the un-padded crop
# extent S-dh × S-dw) — stored fp16 when ``half``
# (detect_core.infer_page_arrays documents why fp16 is decision-safe for the
# maps and never applied to the coordinate rows).
TENSOR_PAGE_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_offset", pa.int32()),
        pa.field("media_ref", pa.string()),
        pa.field("im_h", pa.int32()),
        pa.field("im_w", pa.int32()),
        pa.field("blks", pa.large_binary()),
        pa.field("blks_w", pa.int32()),
        # Maps ship through ctdray.tensorcodec: value-exact run-length sparse
        # (runs + nonzero pixels) when mostly background — ~10× fewer bytes
        # on typical pages, the difference between streaming and spilling at
        # corpus scale — with an automatic dense fallback (runs empty).
        pa.field("maps", pa.large_binary()),
        pa.field("maps_runs", pa.large_binary()),
        # bit i set = plane i run-length sparse over the FULL (S, S) map
        # (letterbox pad is zero, so sparse ships it free); bit clear =
        # dense CROP fallback to (map_h, map_w) for dense-nonzero prod
        # sigmoid maps.  tensorcodec.encode_page_maps.
        pa.field("maps_mode", pa.int8()),
        pa.field("map_h", pa.int32()),
        pa.field("map_w", pa.int32()),
        pa.field("half", pa.bool_()),
    ]
)

# Doc-carrying split-layout rows: one row per document — the original span
# array plus the per-page tensor payloads (same fields as TENSOR_PAGE_SCHEMA,
# doc-nested).  This is the boundary of the split layout's NO-SHUFFLE path:
# the infer pool emits whole documents, so postprocess can splice in place
# exactly like the fused stage and the groupby(doc_id) barrier is reserved
# for the dense skew tail (pipelines/extract.py _split_out_docs).  Pages are
# stored in media-span order; undecodable pages are simply absent (the
# postprocess walk matches them by media_offset and passes the span through).
TENSOR_PAGE_STRUCT = pa.struct(
    [
        pa.field("media_offset", pa.int32()),
        pa.field("media_ref", pa.string()),
        pa.field("im_h", pa.int32()),
        pa.field("im_w", pa.int32()),
        pa.field("blks", pa.large_binary()),
        pa.field("blks_w", pa.int32()),
        pa.field("maps", pa.large_binary()),
        pa.field("maps_runs", pa.large_binary()),
        pa.field("maps_mode", pa.int8()),
        pa.field("map_h", pa.int32()),
        pa.field("map_w", pa.int32()),
        pa.field("half", pa.bool_()),
    ]
)

TENSOR_DOC_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
        pa.field("pages", pa.list_(TENSOR_PAGE_STRUCT)),
    ]
)

# Refined-mask rows (the engine's mask-<name>.png sink, inference.py:70):
# mask payload is an encoded image (PGM in-sandbox, PNG in prod).
MASK_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_offset", pa.int32()),
        pa.field("media_ref", pa.string()),
        pa.field("mask", pa.binary()),
        pa.field("mask_h", pa.int32()),
        pa.field("mask_w", pa.int32()),
        pa.field("fg_pixels", pa.int64()),
        pa.field("n_blocks", pa.int32()),
    ]
)

# Per-page annotation rows — the engine's equivalent of model2annotations'
# on-disk output shape (per-image JSON block list + mask-<name>.png written
# side by side, inference.py:61-70): everything needed to RESUME mask
# refinement WITHOUT the detector, which is exactly the round-trip contract
# traverse_by_dict exercises (inference.py:180-200; SURVEY.md §3.2).
ANNOTATION_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_offset", pa.int32()),
        pa.field("media_ref", pa.string()),
        pa.field("mask", pa.binary()),     # saved page mask (png/pgm bytes)
        pa.field("mask_h", pa.int32()),
        pa.field("mask_w", pa.int32()),
        pa.field("blocks", pa.list_(BLOCK_STRUCT)),
    ]
)

LANG_LIST = ("eng", "ja", "unknown")  # class-id → language (inference.py:117-118)


def serialize_line_span(quad8, language: str, vertical: bool, angle: int, font_size: float) -> str:
    """Canonical text payload of a detected line span (FIXTURES.md §4):
    ``x1,y1,...,x4,y4|lang|v|angle|fs`` — the 8 ints mirror the reference's
    ``line-*.txt`` rows (inference.py:61-65, np.savetxt fmt='%d')."""
    coords = ",".join(str(int(v)) for v in quad8)
    return f"{coords}|{language}|{int(bool(vertical))}|{int(angle)}|{int(round(font_size))}"

"""Single-process correctness oracle.

Runs the identical per-page chain (ctdray.detect_core) over a document table
sequentially — the shape of the reference's own execution (a tqdm loop over
images, inference.py:28) — and splices detected ``text_line`` spans after
each media span.  The Ray pipeline must produce per-row span-sequence
equality ``(kind, text, media_ref, order)`` against this (BASELINE.md
correctness gate).
"""
from __future__ import annotations

import pyarrow as pa

from .config import DetectorConfig
from .detect_core import doc_out_spans
from .schema import FLAT_SPAN_SCHEMA, OUT_DOC_SCHEMA
from .surrogate import SurrogateDetector


def oracle_doc_spans(doc_id: str, spans: list[dict], detector,
                     cfg: DetectorConfig) -> list[dict]:
    """Single-doc output spans — the shared per-doc chain
    (detect_core.doc_out_spans), exposed under the oracle's name."""
    return doc_out_spans(detector, doc_id, spans, cfg)


def run_oracle(docs: pa.Table, cfg: DetectorConfig | None = None) -> pa.Table:
    """Nested output table (OUT_DOC_SCHEMA) for a document table."""
    cfg = cfg or DetectorConfig()
    det = SurrogateDetector(cfg)
    rows = []
    for rec in docs.to_pylist():
        rows.append({"doc_id": rec["doc_id"],
                     "spans": oracle_doc_spans(rec["doc_id"], rec["spans"], det, cfg)})
    return pa.Table.from_pylist(rows, schema=OUT_DOC_SCHEMA)


def flatten_out_docs(out_docs: pa.Table) -> pa.Table:
    """Nested output docs → flat span rows with the final sequence position
    (FLAT_SPAN_SCHEMA) for order-insensitive comparison."""
    rows = []
    for rec in out_docs.to_pylist():
        for seq, s in enumerate(rec["spans"]):
            rows.append({"doc_id": rec["doc_id"], "seq": seq, **s})
    return pa.Table.from_pylist(rows, schema=FLAT_SPAN_SCHEMA)

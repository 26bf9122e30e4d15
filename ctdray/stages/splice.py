"""Splice stage: re-assemble documents from original + detected span rows.

This is the pipeline's ONE required shuffle (SURVEY.md §7): a
``groupby("doc_id")`` re-uniting each document's spans.  Only compact span
rows (strings + ints) cross the exchange — never pixels or model maps
(SURVEY.md §7 hard point 4).

Ordering contract (FIXTURES.md §4): spans sort by ``(offset, order)``;
original spans carry order=-1 so each media span precedes its detected
``text_line`` spans, and non-media spans pass through untouched.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..schema import OUT_DOC_SCHEMA


def splice_groups(group: pa.Table) -> pa.Table:
    """``map_groups`` body: one or more whole documents' span rows → nested
    output doc rows (schema.OUT_DOC_SCHEMA)."""
    offs = group.column("offset").to_numpy(zero_copy_only=False)
    orders = group.column("order").to_numpy(zero_copy_only=False)
    # Stable lexicographic sort by (doc_id, offset, order).
    docs_np = np.asarray(group.column("doc_id").to_pylist(), dtype=object)
    _, doc_codes = np.unique(docs_np, return_inverse=True)
    sort_idx = np.lexsort((orders, offs, doc_codes))
    sorted_group = group.take(pa.array(sort_idx))
    docs = sorted_group.column("doc_id").to_pylist()
    spans = sorted_group.select(["kind", "text", "media_ref", "offset", "order"]) \
        .to_pylist()
    out_rows: list[dict] = []
    cur_doc = None
    for doc_id, span in zip(docs, spans):
        if doc_id != cur_doc:
            out_rows.append({"doc_id": doc_id, "spans": []})
            cur_doc = doc_id
        out_rows[-1]["spans"].append(span)
    return pa.Table.from_pylist(out_rows, schema=OUT_DOC_SCHEMA)

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
    output doc rows (schema.OUT_DOC_SCHEMA).

    Fully columnar: one lexsort by (doc_id, offset, order), then the nested
    ``spans`` list column is a ListArray wrapped around a StructArray of the
    sorted span fields with offsets at the doc boundaries — no per-row
    Python dicts on the reduce side of the pipeline's one shuffle."""
    offs = group.column("offset").to_numpy(zero_copy_only=False)
    orders = group.column("order").to_numpy(zero_copy_only=False)
    # Stable lexicographic sort by (doc_id, offset, order).
    docs_np = np.asarray(group.column("doc_id").to_pylist(), dtype=object)
    uniq_docs, doc_codes = np.unique(docs_np, return_inverse=True)
    sort_idx = np.lexsort((orders, offs, doc_codes))
    sorted_group = group.take(pa.array(sort_idx))
    sorted_codes = doc_codes[sort_idx]                 # nondecreasing
    starts = np.flatnonzero(np.diff(sorted_codes, prepend=-1))
    list_offsets = np.append(starts, len(sorted_codes)).astype(np.int32)
    struct_type = OUT_DOC_SCHEMA.field("spans").type.value_type
    span_struct = pa.StructArray.from_arrays(
        [sorted_group.column(f.name).combine_chunks().cast(f.type)
         for f in struct_type],
        fields=list(struct_type))
    spans = pa.ListArray.from_arrays(pa.array(list_offsets, pa.int32()),
                                     span_struct)
    doc_ids = pa.array(uniq_docs[sorted_codes[starts]], pa.string())
    return pa.Table.from_arrays([doc_ids, spans], schema=OUT_DOC_SCHEMA)

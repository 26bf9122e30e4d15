"""Label projections — the reference's annotation sinks as derived columns.

S4: YOLO label rows (``cls cx cy w h`` normalized, class always written as 1
exactly like inference.py:43-50) from block rows.
S5 is the span `text` payload itself (schema.serialize_line_span).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import xyxy2yolo


def yolo_labels_batch(batch: pa.Table) -> pa.Table:
    """Block rows (schema.BLOCK_SCHEMA) + page dims → one YOLO label line per
    block: ``1 cx cy w h`` normalized to the page (inference.py:45 writes the
    class as the constant 1)."""
    blk = batch.column("block")
    if isinstance(blk, pa.ChunkedArray):
        blk = blk.combine_chunks()
    xyxy = np.array(blk.field("xyxy").to_pylist(), dtype=np.float64).reshape(-1, 4)
    ws = np.array(batch.column("im_w").to_pylist(), dtype=np.float64)
    hs = np.array(batch.column("im_h").to_pylist(), dtype=np.float64)
    labels = []
    for row, w, h in zip(xyxy, ws, hs):
        cx, cy, bw, bh = xyxy2yolo(row[None], int(w), int(h))[0]
        labels.append(f"1 {cx:.4f} {cy:.4f} {bw:.4f} {bh:.4f}")
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "media_ref": batch.column("media_ref"),
        "label": pa.array(labels, pa.string()),
    })

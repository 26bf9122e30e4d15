"""Decode stage: media_ref → page shape (+ optional pixels).

The reference does ``imread`` per image in the driver loop
(utils/io_utils.py:42, inference.py:30); here decode is a stateless
``map_batches`` task stage.  By default only the page *shape* and a pixel
checksum cross the stage boundary — decoded pixels are re-materialized inside
the pixel-consuming stage (mask refine) when enabled, so multi-MB images
never sit in the object store between stages (SURVEY.md §7 hard point 4).

Undecodable refs become ``decode_ok=false`` rows (poison-pill contract,
SURVEY.md §4) — the stage never raises.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.media import decode_page


class DecodeStage:
    """Callable for ``map_batches`` (stateless; class form only to carry the
    keep_pixels flag)."""

    def __init__(self, keep_pixels: bool = False):
        self.keep_pixels = keep_pixels

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        heights = np.zeros(len(refs), dtype=np.int32)
        widths = np.zeros(len(refs), dtype=np.int32)
        ok = np.zeros(len(refs), dtype=bool)
        checksums = np.zeros(len(refs), dtype=np.int64)
        pixels: list[bytes | None] = []
        for i, ref in enumerate(refs):
            try:
                img = decode_page(ref)
            except (ValueError, KeyError):
                pixels.append(None)
                continue
            heights[i], widths[i] = img.shape[:2]
            ok[i] = True
            # Cheap decode-proof: sum of a strided pixel sample.
            checksums[i] = int(img[::37, ::41].sum())
            pixels.append(bytes(img.tobytes()) if self.keep_pixels else None)
        out = batch.append_column("im_h", pa.array(heights, pa.int32()))
        out = out.append_column("im_w", pa.array(widths, pa.int32()))
        out = out.append_column("decode_ok", pa.array(ok))
        out = out.append_column("px_checksum", pa.array(checksums, pa.int64()))
        if self.keep_pixels:
            out = out.append_column("pixels", pa.array(pixels, pa.binary()))
        return out

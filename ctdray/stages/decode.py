"""Decode stage: media_ref → page shape (+ optional pixels).

The reference does ``imread`` per image in the driver loop
(utils/io_utils.py:42, inference.py:30); here decode is a stateless
``map_batches`` task stage.  By default (``keep_pixels=False``) only the
page *shape* crosses the stage boundary, and it comes from a HEADER-ONLY
probe (stages.multimodal.probe_image_dims) — no pixel decompression — so
the one full decode a page needs happens exactly once, inside whichever
downstream stage consumes pixels (the prod backend's ``infer``, mask
refine, …), never twice.  With ``keep_pixels=True`` the stage decodes
fully and ships pixels + a strided checksum; in probe mode
``px_checksum`` is a constant 0 (no pixels were read — the column is
meaningful ONLY when ``keep_pixels=True``).

Undecodable refs become ``decode_ok=false`` rows (poison-pill contract,
SURVEY.md §4) — the stage never raises.  A payload whose header probes
clean but whose pixel stream is corrupt is decode_ok=true here and
degrades in the pixel-consuming stage (stages.detect wraps every
``decode_page`` in the same ValueError contract).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.media import decode_page, fetch_media
from .multimodal import decode_image, probe_image_dims


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
                if self.keep_pixels:
                    img = decode_page(ref)
                    heights[i], widths[i] = img.shape[:2]
                    # Cheap decode-proof: sum of a strided pixel sample.
                    checksums[i] = int(img[::37, ::41].sum())
                    pixels.append(bytes(img.tobytes()))
                else:
                    payload = fetch_media(ref)
                    try:
                        heights[i], widths[i] = probe_image_dims(payload)
                    except NotImplementedError:
                        # no header probe for this format — full decode
                        # (routes through cv2 when available)
                        heights[i], widths[i] = \
                            decode_image(payload).shape[:2]
                    pixels.append(None)
                ok[i] = True
            except (ValueError, KeyError, NotImplementedError):
                pixels.append(None)
                continue
        out = batch.append_column("im_h", pa.array(heights, pa.int32()))
        out = out.append_column("im_w", pa.array(widths, pa.int32()))
        out = out.append_column("decode_ok", pa.array(ok))
        out = out.append_column("px_checksum", pa.array(checksums, pa.int64()))
        if self.keep_pixels:
            out = out.append_column("pixels", pa.array(pixels, pa.binary()))
        return out

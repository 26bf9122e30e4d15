"""Map codec for the split-layout stage boundary (schema.TENSOR_PAGE_SCHEMA).

The infer→postprocess exchange ships two page-size float maps per page
(~8 MB fp32 / ~4 MB fp16).  Detection maps are mostly background: the UNet
mask and DB shrink map are zero (or near-zero) outside text regions, so a
run-length sparse encoding of the NONZERO pixels is value-EXACT and cuts the
shipped bytes by ~10× on typical pages — measured on the bench corpus this
is the difference between the object store streaming the maps and spilling
them to disk.  Production sigmoid maps may be dense-nonzero everywhere; the
encoder falls back to dense automatically whenever sparse would not pay
(``sparse_threshold`` on the nonzero fraction), so the codec never loses
values and never inflates bytes.

Layout (C row-major, matching ``arr.ravel()``):
  dense:  values = arr.tobytes(), runs = b""
  sparse: runs   = int32 [start, end) per maximal nonzero run in FLAT
          (ravel) index space — runs may cross row boundaries, which both
          shrinks the run table on tall text regions and keeps the encoder
          a handful of 1-D passes (the original per-row [row, start, end]
          triples needed 2-D ``np.nonzero`` calls that dominated the
          encode cost at ~4 ms/map),
          values = the run pixels concatenated in run order.
"""
from __future__ import annotations

import numpy as np

_RUN_DT = np.int32


def encode_map(arr: np.ndarray,
               sparse_threshold: float = 0.25) -> tuple[bool, bytes, bytes]:
    """(sparse?, runs_bytes, values_bytes) for a 2-D map.  Value-exact in
    both modes; sparse only when the nonzero fraction is under the
    threshold (runs carry 8 B each on top of the pixel payload)."""
    assert arr.ndim == 2
    flat = np.ascontiguousarray(arr).reshape(-1)
    nzb = flat != 0
    nnz = int(np.count_nonzero(nzb))
    if nnz > flat.size * sparse_threshold:
        return False, b"", flat.tobytes()
    # Maximal nonzero runs in flat index space: sign changes of the 0/1 mask.
    x = nzb.view(np.int8)
    d = x[1:] - x[:-1]
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if nnz and x[0]:
        starts = np.concatenate(([0], starts))
    if nnz and x[-1]:
        ends = np.concatenate((ends, [flat.size]))
    runs = np.empty((len(starts), 2), dtype=_RUN_DT)
    runs[:, 0] = starts
    runs[:, 1] = ends
    values = flat[nzb]          # flat-order nonzero pixels == run order
    return True, runs.tobytes(), values.tobytes()


def decode_map(sparse: bool, runs_bytes: bytes, values_bytes: bytes,
               shape: tuple[int, int], dtype) -> np.ndarray:
    """Inverse of :func:`encode_map`; returns a (h, w) array of ``dtype``."""
    h, w = shape
    if not sparse:
        return np.frombuffer(values_bytes, dtype=dtype).reshape(h, w)
    out = np.zeros(h * w, dtype=dtype)
    runs = np.frombuffer(runs_bytes, dtype=_RUN_DT).reshape(-1, 2)
    if len(runs):
        values = np.frombuffer(values_bytes, dtype=dtype)
        starts = runs[:, 0].astype(np.int64)
        lens = (runs[:, 1] - runs[:, 0]).astype(np.int64)
        # vectorized concat of per-run aranges → scatter only the nnz pixels
        cum = np.cumsum(lens)
        ar = np.arange(cum[-1], dtype=np.int64) - np.repeat(cum - lens, lens)
        out[np.repeat(starts, lens) + ar] = values
    return out.reshape(h, w)

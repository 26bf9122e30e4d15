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
  sparse: runs   = int32 [row, start, end] per maximal nonzero run,
          values = the run pixels concatenated in run order.
"""
from __future__ import annotations

import numpy as np

_RUN_DT = np.int32


def encode_map(arr: np.ndarray,
               sparse_threshold: float = 0.25) -> tuple[bool, bytes, bytes]:
    """(sparse?, runs_bytes, values_bytes) for a 2-D map.  Value-exact in
    both modes; sparse only when the nonzero fraction is under the
    threshold (runs carry 12 B each on top of the pixel payload)."""
    assert arr.ndim == 2
    nzb = arr != 0
    nnz = int(np.count_nonzero(nzb))
    if nnz > arr.size * sparse_threshold:
        return False, b"", np.ascontiguousarray(arr).tobytes()
    # Maximal per-row runs: transitions of the padded 0/1 mask.
    d = np.diff(nzb.astype(np.int8), axis=1, prepend=np.int8(0),
                append=np.int8(0))
    srow, scol = np.nonzero(d == 1)
    erow, ecol = np.nonzero(d == -1)
    # starts/ends pair up in scan order (every run opens before it closes
    # within its row; rows scan top-down): srow == erow by construction.
    runs = np.empty((len(srow), 3), dtype=_RUN_DT)
    runs[:, 0] = srow
    runs[:, 1] = scol
    runs[:, 2] = ecol
    values = arr[nzb]          # row-major nonzero pixels == run order
    return True, runs.tobytes(), np.ascontiguousarray(values).tobytes()


def decode_map(sparse: bool, runs_bytes: bytes, values_bytes: bytes,
               shape: tuple[int, int], dtype) -> np.ndarray:
    """Inverse of :func:`encode_map`; returns a (h, w) array of ``dtype``."""
    h, w = shape
    if not sparse:
        return np.frombuffer(values_bytes, dtype=dtype).reshape(h, w)
    out = np.zeros((h, w), dtype=dtype)
    runs = np.frombuffer(runs_bytes, dtype=_RUN_DT).reshape(-1, 3)
    if len(runs):
        values = np.frombuffer(values_bytes, dtype=dtype)
        lens = (runs[:, 2] - runs[:, 1]).astype(np.int64)
        base = runs[:, 0].astype(np.int64) * w + runs[:, 1]
        # vectorized concat of per-run aranges
        cum = np.cumsum(lens)
        ar = np.arange(cum[-1], dtype=np.int64) - np.repeat(cum - lens, lens)
        out.ravel()[np.repeat(base, lens) + ar] = values
    return out

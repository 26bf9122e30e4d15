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

Compute stays fp32 end-to-end; fp16 exists only INSIDE the stored bytes.
Numpy has no native half-precision kernels — a ``!= 0`` scan over an fp16 map
costs ~11× the fp32 scan, and the downstream threshold/CC kernels pay the
same tax — so the encoder takes fp32 input and casts only the values it
actually stores (``store_dtype``: the nnz pixels in sparse mode, the whole
map in the dense fallback), and the decoder scatters back into an fp32
output (``out_dtype``).  The fp16 cast therefore touches ~16% of pixels on
typical pages instead of 100% twice, and postprocess always runs at fp32
speed.  (Sigmoid outputs live in [0,1]; fp16's 2^-11 relative step is two
orders below the coarsest decision threshold — see
detect_core.infer_page_arrays.)

Nonzero detection runs on an unsigned-integer VIEW of the float buffer
(``uint16``/``uint32`` compares are native where fp16 compares are not).
The one semantic wrinkle — ``-0.0`` has nonzero bits — only makes the codec
MORE exact: a negative zero is stored explicitly and reproduced bitwise,
where a float compare would have dropped it to ``+0.0``.

Layout (C row-major, matching ``arr.ravel()``):
  dense:  values = arr.astype(store_dtype).tobytes(), runs = b""
  sparse: runs   = int32 [start, end) per maximal nonzero run in FLAT
          (ravel) index space — runs may cross row boundaries, which both
          shrinks the run table on tall text regions and keeps the encoder
          a handful of 1-D passes (the original per-row [row, start, end]
          triples needed 2-D ``np.nonzero`` calls that dominated the
          encode cost at ~4 ms/map),
          values = the run pixels concatenated in run order, store_dtype.

A page's TWO maps (UNet mask + DB shrink channel) share one codec call via a
stacked ``(2, h, w)`` buffer — one nonzero scan, one runs table, one values
buffer — instead of paying the fixed encode overheads twice
(detect_core.infer_page_maps builds the stack copy-free).
"""
from __future__ import annotations

import numpy as np

_RUN_DT = np.int32


def _nonzero_bits(flat: np.ndarray) -> np.ndarray:
    """Bitwise-nonzero mask of a contiguous 1-D array — native-speed even
    for fp16 (whose float compares numpy emulates in software)."""
    try:
        iv = flat.view(np.dtype(f"u{flat.dtype.itemsize}"))
    except (TypeError, ValueError):     # exotic dtype: float compare
        return flat != 0
    return iv != 0


def encode_map(arr: np.ndarray, sparse_threshold: float = 0.25,
               store_dtype=None) -> tuple[bool, bytes, bytes]:
    """(sparse?, runs_bytes, values_bytes) for a 2-D or stacked 3-D map.
    Value-exact in both modes; sparse only when the nonzero fraction is
    under the threshold (runs carry 8 B each on top of the pixel payload).
    ``store_dtype`` casts the STORED values only (see module docstring);
    default keeps ``arr.dtype``."""
    assert arr.ndim in (2, 3)
    flat = np.ascontiguousarray(arr).reshape(-1)
    store = np.dtype(store_dtype) if store_dtype is not None else flat.dtype
    nzb = _nonzero_bits(flat)
    nnz = int(np.count_nonzero(nzb))
    if nnz > flat.size * sparse_threshold:
        if store != flat.dtype:
            flat = flat.astype(store)
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
    if store != values.dtype:
        values = values.astype(store)   # cast the nnz values only
    return True, runs.tobytes(), values.tobytes()


def _rects_to_runs(rects, size: int):
    """Painted-rect list [(y0, y1, x0, x1), ...] on an (S, S) canvas →
    sorted, merged, non-overlapping flat-space runs ``(starts, ends)``
    int64.  Overlapping / adjacent row intervals are unioned so the run
    table matches what a scan of the union region would produce."""
    ys = np.concatenate([np.arange(y0, y1, dtype=np.int64)
                         for (y0, y1, x0, x1) in rects])
    xs0 = np.concatenate([np.full(y1 - y0, x0, dtype=np.int64)
                          for (y0, y1, x0, x1) in rects])
    xs1 = np.concatenate([np.full(y1 - y0, x1, dtype=np.int64)
                          for (y0, y1, x0, x1) in rects])
    starts = ys * size + xs0
    ends = ys * size + xs1
    order = np.argsort(starts, kind="stable")
    starts, ends = starts[order], ends[order]
    # interval union: a run opens a new segment iff it starts beyond the
    # running max end of everything before it
    run_end = np.maximum.accumulate(ends)
    new_seg = np.empty(len(starts), dtype=bool)
    new_seg[0] = True
    new_seg[1:] = starts[1:] > run_end[:-1]
    seg_idx = np.flatnonzero(new_seg)
    return starts[seg_idx], np.maximum.reduceat(ends, seg_idx)


def encode_page_maps(planes, crop_h: int, crop_w: int,
                     store_dtype=None,
                     sparse_threshold: float = 0.25,
                     paint_rects=None) -> tuple[int, bytes,
                                                bytes]:
    """Codec for a page's TWO full-size (S, S) maps in ONE (runs, values)
    pair: ``(mode, runs_bytes, values_bytes)``.

    Each plane is scanned IN PLACE (no crop copy): when its nonzero count is
    small — the typical detection map, whose letterbox pad region is exactly
    zero — the plane ships as flat-space runs offset by ``i·S²`` and only
    the nnz values.  A plane that would not pay for sparse (prod sigmoid
    maps, dense-nonzero everywhere incl. the pad) falls back to a DENSE CROP
    to the un-padded ``(crop_h, crop_w)`` region instead — that copy happens
    only in the fallback, and the pad bytes never ship in either mode.

    ``mode`` bit ``i`` set = plane ``i`` sparse.  Values buffer = plane 0's
    part then plane 1's, store_dtype throughout.

    ``paint_rects`` (optional): per-plane lists of ``(y0, y1, x0, x1)``
    rects GUARANTEED to bound every nonzero pixel — backends that know
    where they wrote (the surrogate's painter; an on-device-thresholding
    prod backend could expose the same) let the codec build the run table
    straight from that geometry and skip the full-plane nonzero scan
    (~5 full-size passes/plane).  The runs are then a SUPERSET of the true
    nonzero set, which stays value-exact: the extra pixels ship as (and
    decode to) zeros.  ``None`` (or a ``None`` plane entry) falls back to
    the scan — identical output modulo those in-run zeros."""
    size = planes[0].shape[0]
    plane_n = planes[0].size
    store = np.dtype(store_dtype) if store_dtype is not None \
        else planes[0].dtype
    mode = 0
    runs_parts: list[bytes] = []
    vals_parts: list[bytes] = []
    for i, p in enumerate(planes):
        flat = np.ascontiguousarray(p).reshape(-1)
        rects = paint_rects[i] if paint_rects is not None else None
        if rects is not None:
            if len(rects):
                starts, ends = _rects_to_runs(rects, size)
                lens = ends - starts
                sup_nnz = int(lens.sum())
            else:
                starts = ends = lens = np.empty(0, dtype=np.int64)
                sup_nnz = 0
            if sup_nnz <= crop_h * crop_w * sparse_threshold:
                mode |= 1 << i
                runs = np.empty((len(starts), 2), dtype=_RUN_DT)
                runs[:, 0] = starts + i * plane_n
                runs[:, 1] = ends + i * plane_n
                runs_parts.append(runs.tobytes())
                if sup_nnz:
                    cum = np.cumsum(lens)
                    ar = np.arange(sup_nnz, dtype=np.int64) \
                        - np.repeat(cum - lens, lens)
                    values = flat[np.repeat(starts, lens) + ar]
                    if store != values.dtype:
                        values = values.astype(store)
                    vals_parts.append(values.tobytes())
                continue
            # superset too big for sparse → dense crop fallback (below)
            crop = p[:crop_h, :crop_w]
            if store != crop.dtype:
                crop = crop.astype(store)
            vals_parts.append(np.ascontiguousarray(crop).tobytes())
            continue
        nzb = _nonzero_bits(flat)
        nnz = int(np.count_nonzero(nzb))
        if nnz > crop_h * crop_w * sparse_threshold:
            crop = p[:crop_h, :crop_w]
            if store != crop.dtype:
                crop = crop.astype(store)
            vals_parts.append(np.ascontiguousarray(crop).tobytes())
            continue
        mode |= 1 << i
        x = nzb.view(np.int8)
        d = x[1:] - x[:-1]
        starts = np.flatnonzero(d == 1) + 1
        ends = np.flatnonzero(d == -1) + 1
        if nnz and x[0]:
            starts = np.concatenate(([0], starts))
        if nnz and x[-1]:
            ends = np.concatenate((ends, [flat.size]))
        runs = np.empty((len(starts), 2), dtype=_RUN_DT)
        runs[:, 0] = starts + i * plane_n
        runs[:, 1] = ends + i * plane_n
        runs_parts.append(runs.tobytes())
        values = flat[nzb]
        if store != values.dtype:
            values = values.astype(store)
        vals_parts.append(values.tobytes())
    return mode, b"".join(runs_parts), b"".join(vals_parts)


def decode_page_maps(mode: int, runs_bytes: bytes, values_bytes: bytes,
                     crop_h: int, crop_w: int, store_dtype,
                     out_dtype=None) -> np.ndarray:
    """Inverse of :func:`encode_page_maps` → a full-size ``(2, S, S)`` array
    of ``out_dtype`` (S = max(crop_h, crop_w): the letterbox pads exactly one
    axis, so the un-padded extent reaches S on the other).  Postprocess takes
    plane 1 (the shrink map) full-size — no pad reconstruction — and views
    plane 0's crop."""
    store = np.dtype(store_dtype)
    out_dt = np.dtype(out_dtype) if out_dtype is not None else store
    size = max(crop_h, crop_w)
    plane_n = size * size
    out = np.zeros((2, size, size), dtype=out_dt)
    flat = out.reshape(-1)
    runs = np.frombuffer(runs_bytes, dtype=_RUN_DT).reshape(-1, 2)
    vals = np.frombuffer(values_bytes, dtype=store)
    if out_dt != store:
        vals = vals.astype(out_dt)
    vpos = 0
    rpos = 0
    for i in (0, 1):
        if mode & (1 << i):
            # this plane's runs are the contiguous slice within [i·S², (i+1)·S²)
            rend = int(np.searchsorted(runs[:, 0], (i + 1) * plane_n, "left"))
            r = runs[rpos:rend]
            rpos = rend
            if len(r):
                starts = r[:, 0].astype(np.int64)
                lens = (r[:, 1] - r[:, 0]).astype(np.int64)
                cum = np.cumsum(lens)
                ar = np.arange(cum[-1], dtype=np.int64) \
                    - np.repeat(cum - lens, lens)
                flat[np.repeat(starts, lens) + ar] = vals[vpos:vpos + cum[-1]]
                vpos += int(cum[-1])
        else:
            n = crop_h * crop_w
            out[i, :crop_h, :crop_w] = \
                vals[vpos:vpos + n].reshape(crop_h, crop_w)
            vpos += n
    return out


def decode_map(sparse: bool, runs_bytes: bytes, values_bytes: bytes,
               shape: tuple, store_dtype, out_dtype=None) -> np.ndarray:
    """Inverse of :func:`encode_map`; returns a ``shape`` array of
    ``out_dtype`` (default: ``store_dtype``).  When they differ, only the
    stored values are cast — the background stays a plain fp32 zeros fill."""
    store = np.dtype(store_dtype)
    out = np.dtype(out_dtype) if out_dtype is not None else store
    n = int(np.prod(shape))
    if not sparse:
        dense = np.frombuffer(values_bytes, dtype=store)
        if out != store:
            dense = dense.astype(out)
        return dense.reshape(shape)
    buf = np.zeros(n, dtype=out)
    runs = np.frombuffer(runs_bytes, dtype=_RUN_DT).reshape(-1, 2)
    if len(runs):
        values = np.frombuffer(values_bytes, dtype=store)
        if out != store:
            values = values.astype(out)
        starts = runs[:, 0].astype(np.int64)
        lens = (runs[:, 1] - runs[:, 0]).astype(np.int64)
        # vectorized concat of per-run aranges → scatter only the nnz pixels
        cum = np.cumsum(lens)
        ar = np.arange(cum[-1], dtype=np.int64) - np.repeat(cum - lens, lens)
        buf[np.repeat(starts, lens) + ar] = values
    return buf.reshape(shape)

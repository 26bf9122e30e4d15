"""Distributed EXACT quantiles without a global sort.

Classic distributed selection: streaming passes narrow each target rank to
a value range via fixed-edge histograms (counts are distributive — the
exchange carries one small partial row per batch), then the final tiny
candidate set is ranked exactly.  log_B(n) passes instead of an
all-to-all sort; the returned values are DATA ELEMENTS (rank ceil(q·n),
DuckDB ``quantile_disc`` semantics), so the result hashes exactly against
the SQL oracle — no floating-point interpolation.
"""
from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _col_np(batch: pa.Table, col: str) -> np.ndarray:
    return batch.column(col).to_numpy(zero_copy_only=False)


def _range_mask(v: np.ndarray, lo: float, hi: float,
                inclusive: bool) -> np.ndarray:
    m = (v >= lo) & (v < hi)
    if inclusive:
        m |= v == hi
    return m


def exact_quantiles(ds: ray.data.Dataset, col: str,
                    qs=(0.25, 0.5, 0.75, 0.95),
                    n_bins: int = 4096,
                    collect_cap: int = 200_000) -> pa.Table:
    """→ pa.Table (q, value): exact discrete quantiles of ``col``.

    Pass 1 aggregates (count, min, max); pass 2 histograms with shared
    edges (one pass serves every target whose range coincides — the first
    round always shares); ranges still holding more than ``collect_cap``
    candidates refine with further passes; the final pass collects only
    the small candidate ranges and selects exact ranks driver-side.
    Ranges are half-open [lo, hi) except at the global maximum."""
    def minmax(batch: pa.Table) -> pa.Table:
        v = _col_np(batch, col)
        if len(v) == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        return pa.table({"n": pa.array([len(v)], pa.int64()),
                         "mn": pa.array([float(v.min())], pa.float64()),
                         "mx": pa.array([float(v.max())], pa.float64())})

    parts = ds.map_batches(minmax, batch_format="pyarrow").take_all()
    n = int(sum(r["n"] for r in parts))
    if n == 0:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    lo0 = float(min(r["mn"] for r in parts))
    hi0 = float(max(r["mx"] for r in parts))

    # target: smallest v with count(<= v) >= ceil(q*n)   (quantile_disc)
    # state per q: (lo, hi, inclusive, rank-within-range, n_in_range)
    state = {float(q): (lo0, hi0, True, max(1, math.ceil(q * n)), n)
             for q in qs}

    hist_cache: dict = {}

    def hist_counts(lo: float, hi: float, inclusive: bool):
        key = (lo, hi, inclusive)
        if key in hist_cache:
            return hist_cache[key]
        edges = np.linspace(lo, hi, n_bins + 1)

        def hist(batch: pa.Table) -> pa.Table:
            v = _col_np(batch, col)
            v = v[_range_mask(v, lo, hi, inclusive)]
            if len(v) == 0:
                return pa.table({"h": pa.array([], pa.list_(pa.int64()))})
            idx = np.clip(np.searchsorted(edges, v, side="right") - 1,
                          0, n_bins - 1)
            c = np.bincount(idx, minlength=n_bins)
            return pa.table({"h": pa.array([c.tolist()],
                                           pa.list_(pa.int64()))})

        rows = ds.map_batches(hist, batch_format="pyarrow").take_all()
        total = np.zeros(n_bins, dtype=np.int64)
        for r in rows:
            total += np.asarray(r["h"], dtype=np.int64)
        hist_cache[key] = (edges, total)
        return edges, total

    for _ in range(4):                      # 4096^4 ≫ any realistic n
        refined = False
        for q, (lo, hi, incl, rank, n_range) in list(state.items()):
            if n_range <= collect_cap or hi <= lo:
                continue
            refined = True
            edges, counts = hist_counts(lo, hi, incl)
            cum = np.cumsum(counts)
            bi = int(np.searchsorted(cum, rank, side="left"))
            rank_in_bin = rank - (int(cum[bi - 1]) if bi else 0)
            b_lo = float(edges[bi])
            b_hi = float(edges[bi + 1]) if bi + 1 <= n_bins else hi
            child_incl = incl and (bi == n_bins - 1)
            state[q] = (b_lo, b_hi, child_incl, rank_in_bin,
                        int(counts[bi]))
        if not refined:
            break

    # degenerate ranges (all remaining values equal) answer directly —
    # never collect a constant column driver-side
    resolved = {q: lo for q, (lo, hi, _i, _r, _n) in state.items()
                if hi <= lo}
    ranges = [(q, *state[q]) for q in state if q not in resolved]
    if not ranges:
        qs_sorted = sorted(resolved)
        return pa.table({"q": pa.array(qs_sorted, pa.float64()),
                         "value": pa.array([resolved[q] for q in qs_sorted],
                                           pa.float64())})

    def collect(batch: pa.Table) -> pa.Table:
        v = _col_np(batch, col)
        out_q, out_v = [], []
        for q, lo, hi, incl, _rank, _nr in ranges:
            sel = v[_range_mask(v, lo, hi, incl)]
            out_q.extend([q] * len(sel))
            out_v.extend(sel.tolist())
        return pa.table({"q": pa.array(out_q, pa.float64()),
                         "value": pa.array(out_v, pa.float64())})

    rows = ds.map_batches(collect, batch_format="pyarrow").take_all()
    by_q: dict[float, list] = {q: [] for q, *_ in ranges}
    for r in rows:
        by_q[r["q"]].append(r["value"])
    out_q, out_v = [], []
    for q, lo, hi, incl, rank, _nr in ranges:
        vals = np.sort(np.asarray(by_q[q]))
        out_q.append(q)
        out_v.append(float(vals[rank - 1]))
    for q, v in resolved.items():
        out_q.append(q)
        out_v.append(float(v))
    order = np.argsort(out_q)
    return pa.table({"q": pa.array(np.asarray(out_q)[order], pa.float64()),
                     "value": pa.array(np.asarray(out_v)[order], pa.float64())})


def grouped_exact_quantiles(ds: ray.data.Dataset, key_col: str, col: str,
                            qs=(0.25, 0.5, 0.75, 0.95),
                            n_bins: int = 1024,
                            collect_cap: int = 100_000) -> pa.Table:
    """→ pa.Table (key_col, q, value): exact per-group discrete quantiles.

    Same histogram-refinement selection as :func:`exact_quantiles`, keyed:
    every pass histograms ALL active (group, q) ranges in ONE dataset scan
    (the range list is ``ray.put`` once per pass; each batch contributes one
    small (range_id, counts) partial per range), so pass count stays
    log_B(max group size) regardless of how many groups × quantiles are in
    flight.  Assumes the group-key cardinality is bounded (any groupby
    result that must fit a driver table — same contract as the SQL oracle);
    group SIZES are unbounded and never collected."""
    import ray

    def minmax(batch: pa.Table) -> pa.Table:
        t = pa.table({"k": batch.column(key_col), "v": batch.column(col)})
        res = t.group_by(["k"]).aggregate([("v", "count"), ("v", "min"),
                                           ("v", "max")])
        return pa.table({"k": res.column("k"),
                         "n": pc.cast(res.column("v_count"), pa.int64()),
                         "mn": pc.cast(res.column("v_min"), pa.float64()),
                         "mx": pc.cast(res.column("v_max"), pa.float64())})

    stats: dict = {}
    for r in ds.map_batches(minmax, batch_format="pyarrow").take_all():
        k = r["k"]
        if k in stats:
            n0, lo0, hi0 = stats[k]
            stats[k] = (n0 + r["n"], min(lo0, r["mn"]), max(hi0, r["mx"]))
        else:
            stats[k] = (r["n"], r["mn"], r["mx"])
    if not stats:
        return pa.table({key_col: pa.array([], pa.string()),
                         "q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})

    # state[(key, q)] = (lo, hi, inclusive, rank-in-range, n_in_range)
    state = {(k, float(q)): (lo, hi, True, max(1, math.ceil(q * n)), n)
             for k, (n, lo, hi) in stats.items() for q in qs}

    def _active():
        return [(kq, rng) for kq, rng in state.items()
                if rng[4] > collect_cap and rng[1] > rng[0]]

    for _ in range(4):
        active = _active()
        if not active:
            break
        ranges = [(i, kq[0], *rng[:3]) for i, (kq, rng) in enumerate(active)]
        ranges_ref = ray.put(ranges)

        def hist(batch: pa.Table) -> pa.Table:
            v = _col_np(batch, col)
            keys = batch.column(key_col).to_numpy(zero_copy_only=False)
            out_i, out_h = [], []
            for rid, k, lo, hi, incl in ray.get(ranges_ref):
                sel = v[(keys == k) & _range_mask(v, lo, hi, incl)]
                if len(sel) == 0:
                    continue
                edges = np.linspace(lo, hi, n_bins + 1)
                idx = np.clip(np.searchsorted(edges, sel, side="right") - 1,
                              0, n_bins - 1)
                out_i.append(rid)
                out_h.append(np.bincount(idx, minlength=n_bins).tolist())
            return pa.table({"rid": pa.array(out_i, pa.int64()),
                             "h": pa.array(out_h, pa.list_(pa.int64()))})

        totals = {i: np.zeros(n_bins, dtype=np.int64)
                  for i in range(len(active))}
        for r in ds.map_batches(hist, batch_format="pyarrow").take_all():
            totals[r["rid"]] += np.asarray(r["h"], dtype=np.int64)
        for i, (kq, (lo, hi, incl, rank, _n)) in enumerate(active):
            counts = totals[i]
            edges = np.linspace(lo, hi, n_bins + 1)
            cum = np.cumsum(counts)
            bi = int(np.searchsorted(cum, rank, side="left"))
            rank_in_bin = rank - (int(cum[bi - 1]) if bi else 0)
            b_lo = float(edges[bi])
            b_hi = float(edges[bi + 1]) if bi + 1 <= n_bins else hi
            state[kq] = (b_lo, b_hi, incl and (bi == n_bins - 1),
                         rank_in_bin, int(counts[bi]))

    resolved = {kq: lo for kq, (lo, hi, *_rest) in state.items() if hi <= lo}
    ranges = [(kq, *state[kq]) for kq in state if kq not in resolved]
    by_kq: dict = {kq: None for kq, *_ in ranges}
    if ranges:
        ranges_ref = ray.put([(i, kq[0], lo, hi, incl)
                              for i, (kq, lo, hi, incl, _r, _n)
                              in enumerate(ranges)])

        def collect(batch: pa.Table) -> pa.Table:
            v = _col_np(batch, col)
            keys = batch.column(key_col).to_numpy(zero_copy_only=False)
            out_i, out_v = [], []
            for rid, k, lo, hi, incl in ray.get(ranges_ref):
                sel = v[(keys == k) & _range_mask(v, lo, hi, incl)]
                out_i.extend([rid] * len(sel))
                out_v.extend(sel.tolist())
            return pa.table({"rid": pa.array(out_i, pa.int64()),
                             "value": pa.array(out_v, pa.float64())})

        vals: dict = {i: [] for i in range(len(ranges))}
        for r in (ds.map_batches(collect, batch_format="pyarrow")
                    .take_all()):
            vals[r["rid"]].append(r["value"])
        for i, (kq, _lo, _hi, _incl, rank, _n) in enumerate(ranges):
            arr = np.sort(np.asarray(vals[i]))
            by_kq[kq] = float(arr[rank - 1])
    by_kq.update(resolved)
    items = sorted(by_kq.items())
    return pa.table({
        key_col: pa.array([k for (k, _q), _v in items]),
        "q": pa.array([q for (_k, q), _v in items], pa.float64()),
        "value": pa.array([v for _kq, v in items], pa.float64()),
    })

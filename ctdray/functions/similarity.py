"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — each ``map_batches`` task multiplies its
batch (float64 numpy) against a **broadcast query matrix** (``ray.put`` once,
resolved in each task; never re-shipped per batch), emits per-batch top-k
candidates, and a tiny ``groupby(q_id)`` reduce keeps the global top-k.  Per
batch work is one matmul; the shuffle carries only (q_id, vec_id, sim)
candidate triples — k × n_queries × n_blocks rows, independent of corpus
size.

Scale path: ``knn_lsh`` buckets vectors with seeded random hyperplanes
(the same family as dedup) and probes only the query's bucket — IVF-style
candidate pruning with identical plumbing.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def vectors_from_column(col, dtype=np.float64) -> np.ndarray:
    """Arrow ``list<float>`` / ``fixed_size_list`` column → (n, dim) numpy,
    via the flat values buffer (``pc.list_flatten`` → ``to_numpy`` →
    reshape): zero-copy-adjacent, no per-row Python round-trip.  The old
    ``np.array(col.to_pylist())`` built n × dim Python floats per batch —
    the dominant cost of every embedding stage at bench scale."""
    import pyarrow.compute as pc

    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    flat = pc.list_flatten(col)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    vals = flat.to_numpy(zero_copy_only=False)
    if vals.size % n:
        raise ValueError("ragged embedding column")
    return np.ascontiguousarray(vals.reshape(n, vals.size // n), dtype=dtype)


def _unit_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


def _topk_table(q_ids, sims: np.ndarray, vec_ids: np.ndarray, k: int) -> pa.Table:
    """sims: (n_queries, n_vecs) → rows (q_id, vec_id, sim) of per-query
    top-k, deterministic tie-break by ascending vec_id."""
    out_q, out_v, out_s = [], [], []
    for qi, q_id in enumerate(q_ids):
        row = sims[qi]
        kk = min(k, row.size)
        if kk == 0:
            continue
        # sort by (-sim, vec_id): lexsort keys are last-key-primary
        order = np.lexsort((vec_ids, -row))[:kk]
        out_q.extend([q_id] * kk)
        out_v.extend(vec_ids[order].tolist())
        out_s.extend(row[order].tolist())
    return pa.table({"q_id": pa.array(out_q, pa.int64()),
                     "vec_id": pa.array(out_v, pa.int64()),
                     "sim": pa.array(out_s, pa.float64())})


def knn_bruteforce(ds: ray.data.Dataset, queries: np.ndarray,
                   q_ids: np.ndarray, k: int = 10,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> ray.data.Dataset:
    """Exact cosine top-k of each query row against the whole dataset.
    Returns (q_id, vec_id, rank) with rank 1..k (sim dropped so the result is
    integer-exact for oracle hashing; ties broken by ascending vec_id)."""
    q_unit_ref = ray.put(_unit_rows(np.asarray(queries, dtype=np.float64)))
    q_ids = np.asarray(q_ids, dtype=np.int64)

    def batch_topk(batch: pa.Table) -> pa.Table:
        q_unit = ray.get(q_unit_ref)
        vecs = vectors_from_column(batch.column(vec_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if vecs.size == 0:
            return _topk_table([], np.zeros((0, 0)), ids, k)
        sims = q_unit @ _unit_rows(vecs).T
        return _topk_table(q_ids, sims, ids, k)

    def final_topk(group: pa.Table) -> pa.Table:
        sims = group.column("sim").to_numpy(zero_copy_only=False)
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sims))[:k]
        out = group.take(pa.array(np.sort(order)))  # stable row order
        order_pos = {int(ids[i]): r + 1 for r, i in enumerate(order)}
        taken = out.column("vec_id").to_numpy(zero_copy_only=False)
        rank = pa.array([order_pos[int(v)] for v in taken], pa.int32())
        return pa.table({"q_id": out.column("q_id"),
                         "vec_id": out.column("vec_id"),
                         "rank": rank})

    cands = ds.map_batches(batch_topk, batch_format="pyarrow")
    return cands.groupby("q_id").map_groups(final_topk, batch_format="pyarrow")


def cosine_range_search(ds: ray.data.Dataset, queries: np.ndarray,
                        q_ids: np.ndarray, threshold: float = 0.2,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> ray.data.Dataset:
    """Radius search (similarity join against a broadcast query set): every
    (q_id, vec_id) pair with cosine ≥ threshold.  Same broadcast-matmul
    shape as :func:`knn_bruteforce` but emits the full match set instead of
    top-k — no reduce needed, the map output IS the answer (ids only, so
    the result hashes exactly against the SQL oracle)."""
    q_unit_ref = ray.put(_unit_rows(np.asarray(queries, dtype=np.float64)))
    q_ids = np.asarray(q_ids, dtype=np.int64)

    def batch_matches(batch: pa.Table) -> pa.Table:
        q_unit = ray.get(q_unit_ref)
        vecs = vectors_from_column(batch.column(vec_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if vecs.size == 0:
            return pa.table({"q_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64())})
        sims = q_unit @ _unit_rows(vecs).T
        qi, vi = np.nonzero(sims >= threshold)
        return pa.table({"q_id": pa.array(q_ids[qi], pa.int64()),
                         "vec_id": pa.array(ids[vi], pa.int64())})

    return ds.map_batches(batch_matches, batch_format="pyarrow")


def _seeded_kmeans(sample: np.ndarray, k: int, iters: int = 8,
                   seed: int = 13) -> np.ndarray:
    """Deterministic Lloyd iterations on a driver-side sample — the IVF
    coarse quantizer.  At 100 TB the sample is a tiny reservoir; centroids
    are then broadcast, never the data."""
    rng = np.random.default_rng(seed)
    k = min(k, len(sample))
    centers = sample[rng.choice(len(sample), k, replace=False)]
    for _ in range(iters):
        d2 = ((sample[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for ci in range(k):
            members = sample[assign == ci]
            if len(members):
                centers[ci] = members.mean(axis=0)
    return centers


def knn_ivf(ds: ray.data.Dataset, queries: np.ndarray, q_ids: np.ndarray,
            k: int = 10, n_lists: int = 8, n_probe: int = 3,
            train_sample: int = 2048, seed: int = 13,
            id_col: str = "vec_id",
            vec_col: str = "embedding") -> ray.data.Dataset:
    """IVF approximate top-k: k-means coarse quantizer (trained on a
    driver-side sample, centroids broadcast once), each task scores only
    vectors whose nearest centroid is among the query's ``n_probe`` closest
    lists.  Same candidate→reduce shape as :func:`knn_bruteforce`.
    Default 3/8 lists probed → recall@10 ≈ 0.74 on gaussian testdata while
    scanning ~37 % of the corpus; n_probe is the recall/cost lever."""
    queries = np.asarray(queries, dtype=np.float64)
    sample_rows = ds.limit(train_sample).take_all()
    sample = np.array([r[vec_col] for r in sample_rows], dtype=np.float64)
    centers = _seeded_kmeans(sample, n_lists, seed=seed)
    centers_ref = ray.put(centers)
    q_unit_ref = ray.put(_unit_rows(queries))
    q_ids = np.asarray(q_ids, dtype=np.int64)
    qd2 = ((queries[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
    probe_lists = np.argsort(qd2, axis=1)[:, :n_probe]      # (nq, n_probe)

    def batch_topk(batch: pa.Table) -> pa.Table:
        cents = ray.get(centers_ref)
        q_unit = ray.get(q_unit_ref)
        vecs = vectors_from_column(batch.column(vec_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if vecs.size == 0:
            return pa.table({"q_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        vd2 = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        vlist = vd2.argmin(axis=1)
        parts = []
        for qi in range(len(q_unit)):
            mask = np.isin(vlist, probe_lists[qi])
            if not mask.any():
                continue
            sims = (q_unit[qi:qi + 1] @ _unit_rows(vecs[mask]).T)
            parts.append(_topk_table([int(q_ids[qi])], sims, ids[mask], k))
        if not parts:
            return pa.table({"q_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.concat_tables(parts)

    def final_topk(group: pa.Table) -> pa.Table:
        sims = group.column("sim").to_numpy(zero_copy_only=False)
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sims))[:k]
        return pa.table({
            "q_id": group.column("q_id").take(pa.array(order)),
            "vec_id": group.column("vec_id").take(pa.array(order)),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int32)),
        })

    cands = ds.map_batches(batch_topk, batch_format="pyarrow")
    return cands.groupby("q_id").map_groups(final_topk, batch_format="pyarrow")


def knn_lsh(ds: ray.data.Dataset, queries: np.ndarray, q_ids: np.ndarray,
            k: int = 10, n_planes: int = 8, seed: int = 11,
            probe_hamming: int = 2, n_tables: int = 6,
            id_col: str = "vec_id",
            vec_col: str = "embedding") -> ray.data.Dataset:
    """Approximate top-k with BOTH standard LSH recall levers:

      multi-table   ``n_tables`` independent plane sets — a true neighbor
                    only needs to collide in ONE table
      multiprobe    within each table, probe every bucket within hamming
                    distance ``probe_hamming`` of the query's bucket
                    (radius 1 probes n_planes+1 of the 2^n_planes buckets)

    A (query, vector) pair scores at most once per batch (seen mask), so
    candidate volume stays bounded.  Recall < 1 by design; raise either
    lever to trade compute for recall."""
    import itertools

    queries = np.asarray(queries, dtype=np.float64)
    dim = queries.shape[1]
    shifts = (1 << np.arange(n_planes, dtype=np.uint64))
    tables = []
    for t in range(n_tables):
        rng = np.random.default_rng(seed + 1000 * t)
        planes = rng.standard_normal((dim, n_planes))

        def bucket_of(m: np.ndarray, _p=planes) -> np.ndarray:
            return (((m @ _p) > 0) * shifts).sum(axis=1, dtype=np.uint64)

        by_bucket: dict[int, list[int]] = {}
        for qi, b in enumerate(bucket_of(queries)):
            probes = {int(b)}
            for r in range(1, probe_hamming + 1):
                for flips in itertools.combinations(range(n_planes), r):
                    x = int(b)
                    for f in flips:
                        x ^= 1 << f
                    probes.add(x)
            for pb in probes:
                lst = by_bucket.setdefault(pb, [])
                if qi not in lst:
                    lst.append(qi)
        tables.append((bucket_of, by_bucket))
    q_unit_ref = ray.put(_unit_rows(queries))
    q_ids = np.asarray(q_ids, dtype=np.int64)

    def batch_topk(batch: pa.Table) -> pa.Table:
        q_unit = ray.get(q_unit_ref)
        vecs = vectors_from_column(batch.column(vec_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if vecs.size == 0:
            return pa.table({"q_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        unit = _unit_rows(vecs)
        seen = np.zeros((len(q_unit), len(vecs)), dtype=bool)
        for bucket_of, by_bucket in tables:
            vb = bucket_of(vecs)
            for b, qis in by_bucket.items():
                mask = vb == np.uint64(b)
                if mask.any():
                    seen[np.ix_(qis, np.nonzero(mask)[0])] = True
        parts = []
        for qi in range(len(q_unit)):
            m = seen[qi]
            if not m.any():
                continue
            sims = q_unit[qi:qi + 1] @ unit[m].T
            parts.append(_topk_table([int(q_ids[qi])], sims, ids[m], k))
        if not parts:
            return pa.table({"q_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.concat_tables(parts)

    def final_topk(group: pa.Table) -> pa.Table:
        sims = group.column("sim").to_numpy(zero_copy_only=False)
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sims))[:k]
        return pa.table({
            "q_id": group.column("q_id").take(pa.array(order)),
            "vec_id": group.column("vec_id").take(pa.array(order)),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int32)),
        })

    cands = ds.map_batches(batch_topk, batch_format="pyarrow")
    return cands.groupby("q_id").map_groups(final_topk, batch_format="pyarrow")

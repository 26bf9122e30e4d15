"""Deduplication operators over a document corpus, Ray-Data-first.

Five strategies, ordered by cost:

  exact_dedup           hash-partition on content fingerprint → first per group
  token_set_dedup       same, on the order/multiplicity-insensitive token set
  minhash_lsh_dedup     shingle → minhash → banded LSH buckets → candidate
                        pairs → exact-Jaccard verify → greedy keep-smallest
  simhash_dedup         60-bit simhash, exact-signature grouping
  simhash_near_dedup    banded hamming-k simhash (pigeonhole bands)
  embedding_near_dedup  cosine near-dup via seeded hyperplane LSH buckets

Scale notes (100 TB): every strategy shuffles only *small keys + ids* —
fingerprints (16 B), band hashes (8 B), signatures (8 B) — never the document
text; the one text-bearing step (Jaccard verification) touches only LSH
candidates, a vanishing fraction of the corpus, fetched by equi-join on
doc_id (pairs and candidate texts never materialize on the driver; hot
buckets are capped to O(n·reps) pairs).  Groupbys pre-aggregate nothing
(first-per-group is the aggregate), so the exchange payload is the key set
itself.
"""
from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .similarity import vectors_from_column
from .text import md5_fingerprint, token_set_key

_MERSENNE = (1 << 61) - 1
_TASK_HASHERS: dict = {}


def _stable_hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(),
                          "little")


# ---------------------------------------------------------------------------
# exact / token-set dedup
# ---------------------------------------------------------------------------


def _first_per_group(group: pa.Table) -> pa.Table:
    i = pc.index(pc.equal(group.column("doc_id"), pc.min(group.column("doc_id"))),
                 True).as_py()
    return group.slice(i, 1)


def _keyed_dedup(ds: ray.data.Dataset, key_fn, key_name: str) -> ray.data.Dataset:
    def add_key(batch: pa.Table) -> pa.Table:
        keys = [key_fn(t) for t in batch.column("text").to_pylist()]
        return batch.append_column(key_name, pa.array(keys, pa.string()))

    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    return (keyed.groupby(key_name)
                 .map_groups(_first_per_group, batch_format="pyarrow"))


def exact_dedup(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Exact dedup: md5(content) partition key, keep the smallest doc_id.
    The 16-byte fingerprint — not the document — is the shuffle key."""
    return _keyed_dedup(ds, lambda t: md5_fingerprint([t])[0], "fingerprint")


def token_set_dedup(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Near-dup modulo word order & repetition: groups = equal sorted-unique
    -token sets.  The shuffle key is ``md5(token_set_key)`` — a fixed-width
    fingerprint, never the document-sized token string — so the exchange
    follows the same "16-byte fingerprint is the shuffle key" rule as
    :func:`exact_dedup`; the string form appears only in the oracle SQL."""
    return _keyed_dedup(
        ds, lambda t: md5_fingerprint([token_set_key(t)])[0], "token_set")


def ngram_jaccard_dedup(ds: ray.data.Dataset, threshold: float = 0.8,
                        shingle_k: int = 3,
                        num_perm: int = 128, bands: int = 32) -> ray.data.Dataset:
    """N-gram (word-shingle) Jaccard dedup at an explicit threshold.

    The scalable candidate generator IS MinHash+LSH (an all-pairs n-gram
    Jaccard is O(n²) by definition); this entry point pins the band/row
    geometry to the requested threshold (b=32, r=4 → s-curve midpoint
    (1/32)^(1/4) ≈ 0.42, catching 0.8-Jaccard pairs with probability
    ~1-(1-0.8^4)^32 ≈ 1.0) and verifies candidates with the exact
    :func:`jaccard` before dropping anything."""
    return minhash_lsh_dedup(ds, num_perm=num_perm, bands=bands,
                             threshold=threshold, shingle_k=shingle_k)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


_MIX1 = np.uint64(0x9E3779B97F4A7C15)      # golden-ratio odd constants
_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P31 = np.uint64((1 << 31) - 1)            # Mersenne prime 2^31-1


def _mod_m31(x: np.ndarray) -> np.ndarray:
    """Exact ``x % (2^31-1)`` for uint64 x < 2^63 without hardware division:
    2^31 ≡ 1 (mod M31), so fold the high bits down twice and subtract."""
    x = (x >> np.uint64(31)) + (x & _P31)
    x = (x >> np.uint64(31)) + (x & _P31)
    return np.where(x >= _P31, x - _P31, x)


class MinHasher:
    """Word-shingle MinHash signatures, fully vectorized.

    Deterministic across processes: per-token base hashes are blake2b-64
    (computed once per *unique* token in a batch), consecutive-k token
    hashes fold into a 32-bit shingle value with numpy mixing, and the
    permutation family ((a*h + b) mod 2^31-1) runs in pure uint64 numpy —
    a < 2^31 and h < 2^32 keep every product under 2^63, so there is no
    big-int fallback and no overflow UB."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, int(_P31), num_perm, dtype=np.uint64)
        self.b = rng.integers(0, int(_P31), num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_k = shingle_k
        self._token_cache: dict[str, int] = {}

    def _token_hashes(self, toks: list[str]) -> np.ndarray:
        cache = self._token_cache
        miss = [t for t in toks if t not in cache]
        for t in dict.fromkeys(miss):
            cache[t] = _stable_hash64(t)
        if len(cache) > 1_000_000:      # bound per-worker memory
            self._token_cache = dict(list(cache.items())[-100_000:])
        return np.fromiter((cache[t] for t in toks), dtype=np.uint64,
                           count=len(toks))

    def shingle_values(self, text: str) -> np.ndarray:
        """Distinct 32-bit shingle hashes of the doc's word k-shingles."""
        toks = text.split()
        k = self.shingle_k
        th = self._token_hashes(toks)
        if len(toks) == 0:
            mixed = np.array([_stable_hash64("")], dtype=np.uint64)
        elif len(toks) < k:
            acc = np.uint64(0)
            for j in range(len(toks)):
                acc = acc * _MIX1 ^ th[j]
            mixed = np.array([acc], dtype=np.uint64)
        else:
            n = len(toks) - k + 1
            acc = np.zeros(n, dtype=np.uint64)
            for j in range(k):
                acc = acc * _MIX1 ^ th[j:j + n]
            mixed = acc
        mixed = (mixed ^ (mixed >> np.uint64(32))) * _MIX2
        return np.unique((mixed >> np.uint64(32)).astype(np.uint32))

    def signature(self, text: str) -> np.ndarray:
        """(num_perm,) uint64 signature — one vectorized modmul + min."""
        h = self.shingle_values(text).astype(np.uint64)
        return np.min((h[None, :] * self.a[:, None] + self.b[:, None]) % _P31,
                      axis=1)

    def signatures(self, texts: list[str]) -> np.ndarray:
        """(n_docs, num_perm) uint64 — the whole batch in one pass.

        Bit-identical to ``np.stack([signature(t) for t in texts])`` (the
        min over permuted shingles is invariant under the per-doc
        ``np.unique`` the scalar path applies): all docs' token hashes go
        into ONE concatenated buffer, the k-fold runs over it in k
        vectorized ops with boundary-crossing windows masked out, and the
        per-doc minima come from segmented ``np.minimum.reduceat`` — no
        per-document Python in the ≥k-token common case."""
        n_docs = len(texts)
        if n_docs == 0:
            return np.empty((0, self.num_perm), dtype=np.uint64)
        k = self.shingle_k
        toks_list = [t.split() for t in texts]
        lens = np.fromiter((len(t) for t in toks_list), np.int64, n_docs)
        th = self._token_hashes(list(itertools.chain.from_iterable(toks_list)))
        offsets = np.concatenate(([0], np.cumsum(lens)))

        # per-doc shingle counts: len-k+1 for full docs, 1 for short/empty
        seg_lens = np.maximum(lens - k + 1, 1)
        seg_starts = np.concatenate(([0], np.cumsum(seg_lens)))
        vals = np.empty(int(seg_starts[-1]), dtype=np.uint64)

        full = lens >= k
        if full.any() and len(th) >= k:
            n_win = len(th) - k + 1
            acc = np.zeros(n_win, dtype=np.uint64)
            for j in range(k):
                acc = acc * _MIX1 ^ th[j:j + n_win]
            # valid (non-boundary-crossing) windows per full doc
            nf = seg_lens[full]
            local = np.arange(int(nf.sum())) - np.repeat(
                np.concatenate(([0], np.cumsum(nf)[:-1])), nf)
            src = np.repeat(offsets[:-1][full], nf) + local
            dst = np.repeat(seg_starts[:-1][full], nf) + local
            vals[dst] = acc[src]
        for d in np.flatnonzero(~full):            # rare: <k tokens
            if lens[d] == 0:
                vals[seg_starts[d]] = _stable_hash64("")
            else:
                acc1 = np.uint64(0)
                for j in range(offsets[d], offsets[d + 1]):
                    acc1 = acc1 * _MIX1 ^ th[j]
                vals[seg_starts[d]] = acc1
        vals = (vals ^ (vals >> np.uint64(32))) * _MIX2
        h = (vals >> np.uint64(32)).astype(np.uint32).astype(np.uint64)

        # per-doc distinct shingles in one global sort: unique over the
        # (doc_index << 32 | shingle) composite key yields each doc's
        # deduped values in doc-major order — the batched equivalent of the
        # scalar path's per-doc np.unique, and it shrinks everything
        # downstream (repetitive docs collapse before the permute/min)
        doc_codes = np.repeat(np.arange(n_docs, dtype=np.uint64), seg_lens)
        dk = np.unique((doc_codes << np.uint64(32)) | h)
        h = dk & np.uint64(0xFFFFFFFF)
        docs2 = dk >> np.uint64(32)
        seg_starts = np.concatenate(
            ([0], np.flatnonzero(docs2[1:] != docs2[:-1]) + 1, [len(dk)]))

        # permute once per distinct shingle value in the whole batch (the
        # expensive modmul), gather back, and take per-doc minima with a
        # segmented reduceat — chunked so the (shingles × num_perm) gather
        # temp stays L2-resident (~512 KB at the default 64 perms); the
        # small chunk is worth ~5× over a single whole-batch gather
        uniq, inv = np.unique(h, return_inverse=True)
        # shingle-major (row) layout + uint32 (values < 2^31): the gather is
        # a contiguous row copy and reduceat's inner axis is contiguous —
        # ~2.5× faster than permutation-major uint64
        vu = _mod_m31(uniq[:, None] * self.a[None, :]
                      + self.b[None, :]).astype(np.uint32)
        out = np.empty((n_docs, self.num_perm), dtype=np.uint64)
        chunk_shingles = 2_048
        d0 = 0
        while d0 < n_docs:
            d1 = d0 + 1
            while d1 < n_docs and \
                    seg_starts[d1 + 1] - seg_starts[d0] <= chunk_shingles:
                d1 += 1
            v = vu[inv[seg_starts[d0]:seg_starts[d1]]]
            out[d0:d1] = np.minimum.reduceat(
                v, seg_starts[d0:d1] - seg_starts[d0], axis=0)
            d0 = d1
        return out

    def band_hashes(self, sigs: np.ndarray, bands: int) -> np.ndarray:
        """(n_docs, num_perm) signatures → (n_docs, bands) uint64 band keys,
        folding each band's rows with the same numpy mixer."""
        n, num_perm = sigs.shape
        r = num_perm // bands
        grouped = sigs[:, :bands * r].reshape(n, bands, r)
        acc = np.zeros((n, bands), dtype=np.uint64)
        for j in range(r):
            acc = acc * _MIX1 ^ grouped[:, :, j]
        return acc


def jaccard(a: str, b: str, k: int = 3) -> float:
    def sh(t):
        toks = t.split()
        if len(toks) < k:
            return {" ".join(toks)} if toks else {""}
        return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / max(1, len(sa | sb))


def _distinct_on(ds: ray.data.Dataset, cols: list[str]) -> ray.data.Dataset:
    """Distributed distinct via per-batch combiner + groupby first — the
    exchange carries already-deduped key rows."""
    def batch_distinct(batch: pa.Table) -> pa.Table:
        return batch.select(cols).group_by(cols).aggregate([])

    def first(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    return (ds.map_batches(batch_distinct, batch_format="pyarrow")
              .groupby(cols[0] if len(cols) == 1 else cols)
              .map_groups(first, batch_format="pyarrow"))


_POLY_P = np.uint64(1099511628211)          # FNV-1a prime, odd → invertible
_poly_pows = np.array([1], dtype=np.uint64)  # powers of P, grown on demand


def _poly_pow_table(n: int) -> np.ndarray:
    global _poly_pows
    if len(_poly_pows) < n:
        size = max(n, 2 * len(_poly_pows))
        # wrap-around cumprod (array ops wrap silently where scalar ops warn)
        facs = np.full(size, _POLY_P, dtype=np.uint64)
        facs[0] = 1
        _poly_pows = np.cumprod(facs)
    return _poly_pows


def _hash_strings_u64(arr: pa.Array) -> np.ndarray:
    """Vectorized uint64 hash of a string column, straight off the Arrow
    buffers: per-byte polynomial accumulation (byte·P^pos, wrap-around
    uint64) segment-summed with np.add.reduceat, then a splitmix avalanche
    salted with the length.  O(total bytes) in numpy kernels — the previous
    per-row ``blake2b(str(x))`` loop was the one Python-per-row path on the
    dedup coarse exchanges (doc_id IS a string in the doc schema)."""
    n = len(arr)
    off_dt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offsets = np.frombuffer(arr.buffers()[1], dtype=off_dt,
                            count=arr.offset + n + 1)[arr.offset:]
    starts = offsets[:-1].astype(np.int64)
    lens = (offsets[1:].astype(np.int64) - starts)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    cum = np.cumsum(lens)
    total = int(cum[-1]) if n else 0
    seg_starts = cum - lens
    sums = np.zeros(n, dtype=np.uint64)
    if total:
        within = np.arange(total, dtype=np.int64) \
            - np.repeat(seg_starts, lens)
        contrib = data[np.repeat(starts, lens) + within].astype(np.uint64) \
            * _poly_pow_table(int(lens.max()))[within]
        # reduceat over NON-EMPTY segments only: empty segments would
        # duplicate (or, at the tail, overflow) the index list and corrupt
        # their neighbours' sums — their hash is the pure length-salt mix.
        nz = lens > 0
        sums[nz] = np.add.reduceat(contrib, seg_starts[nz])
    h = sums ^ (lens.astype(np.uint64) * _MIX2)
    h = (h ^ (h >> np.uint64(33))) * _MIX1
    return h ^ (h >> np.uint64(29))


def _hash_ids_u64(arr: pa.Array) -> np.ndarray:
    """uint64 mix of an id column — numpy splitmix for integer ids,
    buffer-vectorized polynomial hash for strings, blake2b fallback for
    anything else (rare path).  Values are partition/bucket keys only:
    deterministic and consistent across every task in a run, never compared
    against hashes produced by another scheme."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return np.array([], dtype=np.uint64)
    if pa.types.is_integer(arr.type):
        v = arr.cast(pa.int64()).to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        v = (v ^ (v >> np.uint64(33))) * _MIX1
        return v ^ (v >> np.uint64(29))
    if (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)) \
            and arr.null_count == 0:
        return _hash_strings_u64(arr)
    return np.fromiter((_stable_hash64(str(x)) for x in arr.to_pylist()),
                       dtype=np.uint64, count=len(arr))


def verify_pairs_by_text(pairs: ray.data.Dataset,
                         cand_docs: ray.data.Dataset,
                         id_type: pa.DataType,
                         verify,
                         extra_fields: tuple = ()) -> ray.data.Dataset:
    """Shared distributed stamp-and-verify tail for candidate-pair dedup
    (minhash / prefix-filter): attach each candidate doc's text to its
    pair rows and run ``verify(text_a, text_b)`` once per DISTINCT pair.

    ``pairs`` is Dataset[a_id, b_id] (duplicates allowed — the same pair
    may surface once per colliding band / shared prefix token);
    ``cand_docs`` is Dataset[doc_id, text] with one row per candidate.
    ``verify`` returns None to reject or a tuple matching
    ``extra_fields`` ((name, pa.type) pairs appended after a_id/b_id).

    Scale shape: Ray's chained Dataset.join trips over schema-less empty
    partitions in 2.49, so texts attach by the union + groupby equi-join
    — and BOTH exchanges here group on 256-way coarse hash buckets with
    the reduce side vectorized over sorted runs: high-cardinality
    map_groups dispatch (one Python/Arrow call per key or per pair) is
    the measured bottleneck at bench scale, not the shuffled bytes."""

    def explode_sides(batch: pa.Table) -> pa.Table:
        a = batch.column("a_id").combine_chunks()
        b = batch.column("b_id").combine_chunks()
        n = len(batch)
        key = pa.concat_arrays([a, b])
        pp = ((_hash_ids_u64(a) * _MIX1) ^ (_hash_ids_u64(b) * _MIX2))
        pp = (pp >> np.uint64(56)).astype(np.int32)
        pk = (_hash_ids_u64(key) >> np.uint64(56)).astype(np.int32)
        return pa.table({
            "key": key,
            "a_id": pa.concat_arrays([a, a]),
            "b_id": pa.concat_arrays([b, b]),
            "is_a": pa.array([True] * n + [False] * n, pa.bool_()),
            "text": pa.nulls(2 * n, pa.string()),
            "__pk": pa.array(pk),
            "__pp": pa.array(np.tile(pp, 2)),
        })

    def doc_side(batch: pa.Table) -> pa.Table:
        n = len(batch)
        did = batch.column("doc_id").cast(id_type).combine_chunks()
        pk = (_hash_ids_u64(did) >> np.uint64(56)).astype(np.int32)
        return pa.table({
            "key": did,
            "a_id": pa.nulls(n, id_type),
            "b_id": pa.nulls(n, id_type),
            "is_a": pa.nulls(n, pa.bool_()),
            "text": batch.column("text"),
            "__pk": pa.array(pk),
            "__pp": pa.array(np.zeros(n, np.int32)),
        })

    def stamp_coarse(group: pa.Table) -> pa.Table:
        """All keys of one coarse bucket: sort (key, doc-row-first),
        detect key runs, stamp the run's text across its side rows —
        zero per-key Python dispatch."""
        n = len(group)
        t = group.append_column(
            "__vf", pc.cast(pc.is_null(group.column("text")), pa.int8()))
        t = t.take(pc.sort_indices(
            t, sort_keys=[("key", "ascending"), ("__vf", "ascending")]))
        key = t.column("key").combine_chunks()
        neq = pc.not_equal(key.slice(1), key.slice(0, n - 1)) \
            .to_numpy(zero_copy_only=False) if n > 1 else \
            np.array([], dtype=bool)
        starts = np.r_[0, np.flatnonzero(neq) + 1]
        sizes = np.diff(np.r_[starts, n])
        texts = t.column("text").combine_chunks()
        has_text = pc.is_valid(texts).to_numpy(zero_copy_only=False)
        rows_text = texts.take(pa.array(np.repeat(starts, sizes), pa.int64()))
        keep = (~has_text) & np.repeat(has_text[starts], sizes)
        ka = pa.array(np.flatnonzero(keep), pa.int64())
        return pa.table({
            "a_id": t.column("a_id").take(ka),
            "b_id": t.column("b_id").take(ka),
            "is_a": t.column("is_a").take(ka),
            "text": rows_text.take(ka),
            "__pp": t.column("__pp").take(ka),
        })

    def verify_coarse(group: pa.Table) -> pa.Table:
        """All candidate pairs of one coarse bucket: sort by (a, b),
        verify once per distinct pair run."""
        n = len(group)
        t = group.take(pc.sort_indices(
            group, sort_keys=[("a_id", "ascending"), ("b_id", "ascending")]))
        a = t.column("a_id").combine_chunks()
        b = t.column("b_id").combine_chunks()
        if n > 1:
            neq = pc.or_(
                pc.not_equal(a.slice(1), a.slice(0, n - 1)),
                pc.not_equal(b.slice(1), b.slice(0, n - 1))) \
                .to_numpy(zero_copy_only=False)
        else:
            neq = np.array([], dtype=bool)
        starts = np.r_[0, np.flatnonzero(neq) + 1]
        ends = np.r_[starts[1:], n]
        is_a = pc.cast(t.column("is_a"), pa.bool_()) \
            .to_numpy(zero_copy_only=False)
        texts = t.column("text").to_pylist()
        a_py, b_py = a.to_pylist(), b.to_pylist()
        out_a, out_b = [], []
        extras: list[list] = [[] for _ in extra_fields]
        for s, e in zip(starts, ends):
            ta = tb = None
            for i in range(s, e):
                if is_a[i]:
                    if ta is None:
                        ta = texts[i]
                elif tb is None:
                    tb = texts[i]
                if ta is not None and tb is not None:
                    break
            if ta is None or tb is None:
                continue
            res = verify(ta, tb)
            if res is None:
                continue
            out_a.append(a_py[s])
            out_b.append(b_py[s])
            for lst, v in zip(extras, res):
                lst.append(v)
        cols = {"a_id": pa.array(out_a, id_type),
                "b_id": pa.array(out_b, id_type)}
        for (nm, typ), lst in zip(extra_fields, extras):
            cols[nm] = pa.array(lst, typ)
        return pa.table(cols)

    sides = (pairs.map_batches(explode_sides, batch_format="pyarrow")
             .union(cand_docs.map_batches(doc_side,
                                          batch_format="pyarrow")))
    stamped = sides.groupby("__pk").map_groups(stamp_coarse,
                                               batch_format="pyarrow")
    return stamped.groupby("__pp").map_groups(verify_coarse,
                                              batch_format="pyarrow")


def minhash_verified_pairs(ds: ray.data.Dataset, num_perm: int = 64,
                           bands: int = 16,
                           threshold: float = 0.8, shingle_k: int = 3,
                           bucket_pair_cap: int = 512,
                           hot_bucket_reps: int = 8,
                           broadcast_id_limit: int = 2_000_000
                           ) -> ray.data.Dataset:
    """Verified near-duplicate PAIRS (a_id < b_id, exact shingle-Jaccard ≥
    threshold) found by MinHash+LSH — the shared candidate stage behind
    :func:`minhash_lsh_dedup` (which anti-joins the b-side) and
    :func:`dedup_clusters` (which runs connected components over them).

    Fully distributed — candidate pairs and candidate texts NEVER
    materialize on the driver:

      signatures   vectorized map_batches → (band, band_hash, doc_id) rows;
                   only these 12-byte triples shuffle, never text
      buckets      groupby(band, band_hash) → candidate pairs, CAPPED: a
                   bucket larger than ``bucket_pair_cap`` (hot boilerplate
                   key) emits each id against the first ``hot_bucket_reps``
                   representatives instead of all O(n²) pairs
      pair dedup   distributed distinct on (a_id, b_id)
      text fetch   semi-join of the corpus on the candidate id set (ids
                   only — broadcast while the id count is under
                   ``broadcast_id_limit``, else a shuffle equi-join), then
                   two hash_joins pairs⋈docs on a_id / b_id attach texts
      verify       exact shingle-Jaccard in map_batches over pair rows

    Two streaming passes over the corpus (signatures, candidate fetch);
    every shuffle carries only small keys/candidates.
    """
    from .joins import broadcast_semi_join, hash_join

    def signatures(batch: pa.Table) -> pa.Table:
        # per-worker hasher cache (stateless tasks — see stages.detect for
        # the compute-mode rationale; an autoscaling actor pool plateaus)
        key = ("minhash", num_perm, shingle_k)
        h = _TASK_HASHERS.get(key)
        if h is None:
            h = _TASK_HASHERS[key] = MinHasher(num_perm, shingle_k)
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id")
        n = len(texts)
        if n == 0:
            return pa.table({"band": pa.array([], pa.int32()),
                             "band_hash": pa.array([], pa.uint64()),
                             "__pb": pa.array([], pa.int32()),
                             "doc_id": pa.array([], ids.type)})
        sigs = h.signatures(texts)
        bh = h.band_hashes(sigs, bands)                  # (n, bands)
        flat = bh.reshape(-1)
        band_col = np.tile(np.arange(bands, dtype=np.int32), n)
        # coarse exchange key: 256 buckets of fine (band, band_hash)
        # cells, so the reduce side makes ≤256 Python calls total and
        # pairs each cell vectorized — not one map_groups call per cell
        pb = ((flat ^ (band_col.astype(np.uint64) * _MIX2))
              >> np.uint64(56)).astype(np.int32)
        return pa.table({
            "band": pa.array(band_col),
            "band_hash": pa.array(flat, pa.uint64()),
            "__pb": pa.array(pb),
            "doc_id": pc.take(ids, pa.array(np.repeat(np.arange(n), bands))),
        })

    def bucket_pairs_coarse(group: pa.Table) -> pa.Table:
        """All fine (band, band_hash) cells of one coarse bucket: sort,
        find cell runs, emit each run's pairs with numpy — identical pair
        semantics to the per-cell version (sorted unique ids; all pairs
        under the cap, O(n·reps) star pattern over it), ~300× fewer
        Python-call dispatches."""
        id_arr_type = group.column("doc_id").type
        t = group.sort_by([("band", "ascending"),
                           ("band_hash", "ascending"),
                           ("doc_id", "ascending")])
        band = t.column("band").to_numpy(zero_copy_only=False)
        bh = t.column("band_hash").to_numpy(zero_copy_only=False)
        ids_np = t.column("doc_id").to_numpy(zero_copy_only=False)
        if len(band) == 0:
            return pa.table({"a_id": pa.array([], id_arr_type),
                             "b_id": pa.array([], id_arr_type)})
        change = np.flatnonzero((band[1:] != band[:-1])
                                | (bh[1:] != bh[:-1]))
        starts = np.r_[0, change + 1]
        ends = np.r_[change + 1, len(band)]
        a_parts, b_parts = [], []
        for s, e in zip(starts, ends):
            ids = np.unique(ids_np[s:e])        # sorted unique, as before
            n = len(ids)
            if n < 2:
                continue
            if n > bucket_pair_cap:
                # Hot bucket: O(n·reps) star pattern against the smallest
                # ids.  Boilerplate buckets are near-identical by
                # construction, so the representatives certify the whole
                # bucket; recall loss is bounded and the quadratic blowup
                # is gone.
                reps = min(hot_bucket_reps, n - 1)
                a_parts.extend(np.full(n - 1 - i, ids[i])
                               for i in range(reps))
                b_parts.extend(ids[i + 1:] for i in range(reps))
            else:
                iu, ju = np.triu_indices(n, 1)
                a_parts.append(ids[iu])
                b_parts.append(ids[ju])
        if not a_parts:
            return pa.table({"a_id": pa.array([], id_arr_type),
                             "b_id": pa.array([], id_arr_type)})
        return pa.table({
            "a_id": pa.array(np.concatenate(a_parts)).cast(id_arr_type),
            "b_id": pa.array(np.concatenate(b_parts)).cast(id_arr_type)})

    sigs = ds.map_batches(signatures, batch_format="pyarrow")
    # Only (band, band_hash, doc_id) triples shuffle — the corpus text never
    # enters the LSH exchange.  The same pair may surface once per colliding
    # band; the merge groupby below dedupes it structurally BEFORE the
    # (expensive) exact-Jaccard verification runs.  Pairs are tiny relative
    # to the corpus; materializing avoids re-running the signature scan for
    # each consumer below.  The exchange groups by the 256-way coarse
    # bucket, not the fine cell — high-cardinality map_groups dispatch is
    # the measured bottleneck at bench scale (3.9 s → vectorized runs).
    pairs = (sigs.groupby("__pb")
                 .map_groups(bucket_pairs_coarse,
                             batch_format="pyarrow")).materialize()

    # Candidate id set (ids only — never texts): per-batch unique over the
    # union of both pair sides.  No distinct *exchange* is needed on the
    # broadcast path — broadcast_semi_join dedupes the key set driver-side
    # anyway, so a full sort-shuffle here would buy nothing (measured: one
    # fewer shuffle ≈ −1 s at sf0.1).
    def pair_ids(batch: pa.Table) -> pa.Table:
        both = pa.concat_arrays([batch.column("a_id").combine_chunks(),
                                 batch.column("b_id").combine_chunks()])
        return pa.table({"doc_id": both.unique()})

    cand_ids = pairs.map_batches(pair_ids, batch_format="pyarrow")
    n_cand_max = 2 * pairs.count()      # upper bound; exact needs a shuffle

    # Semi-join the corpus on the candidate ids to fetch texts.  The id set
    # is bounded (≤ 2·|pairs|); broadcast while it fits, else fall back to a
    # shuffle equi-join (no driver materialization of anything unbounded).
    if n_cand_max <= broadcast_id_limit:
        cand_docs = broadcast_semi_join(ds, cand_ids, "doc_id")
    else:  # pragma: no cover - exercised only at extreme scale
        cand_docs = hash_join(ds, _distinct_on(cand_ids, ["doc_id"]),
                              on="doc_id")

    _sch = pairs.schema()
    id_type = dict(zip(_sch.names, _sch.types))["a_id"]

    # Attach texts + verify via the shared coarse-bucketed equi-join tail
    # (see verify_pairs_by_text): exact Jaccard once per distinct pair.
    return verify_pairs_by_text(
        pairs, cand_docs, id_type,
        lambda ta, tb: () if jaccard(ta, tb, shingle_k) >= threshold
        else None)


def minhash_lsh_dedup(ds: ray.data.Dataset, num_perm: int = 64, bands: int = 16,
                      threshold: float = 0.8, shingle_k: int = 3,
                      anti_join: str = "auto",
                      bucket_pair_cap: int = 512,
                      hot_bucket_reps: int = 8,
                      broadcast_id_limit: int = 2_000_000) -> ray.data.Dataset:
    """MinHash+LSH near-dedup; returns surviving (doc_id, text) rows.

    :func:`minhash_verified_pairs` finds verified duplicate pairs fully
    distributed; a doc with a verified smaller partner is a duplicate
    (b_id > a_id within buckets by construction, so the dup set is the
    b_ids), removed from the corpus by a broadcast-vs-shuffle anti-join
    chosen from the measured dup-set size (``anti_join='auto'``).  Three
    streaming passes over the corpus total (signatures, candidate fetch,
    final anti-join)."""
    from .joins import broadcast_anti_join, shuffle_anti_join

    verified = minhash_verified_pairs(
        ds, num_perm=num_perm, bands=bands, threshold=threshold,
        shingle_k=shingle_k, bucket_pair_cap=bucket_pair_cap,
        hot_bucket_reps=hot_bucket_reps,
        broadcast_id_limit=broadcast_id_limit)
    dup_keys = verified.map_batches(
        lambda b: pa.table({"doc_id": b.column("b_id")}),
        batch_format="pyarrow").materialize()

    if anti_join == "auto":
        anti_join = "broadcast" if dup_keys.count() <= broadcast_id_limit \
            else "shuffle"
    if anti_join == "shuffle":
        # 10^12-doc path: dup set too large to broadcast — hash-partition
        # both sides on doc_id instead (one shuffle of the corpus).
        return shuffle_anti_join(ds, dup_keys, "doc_id")
    return broadcast_anti_join(ds, dup_keys, "doc_id")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


SIMHASH_BITS = 60      # fits a signed 64-bit int → SQL-oracle-friendly


_SIMHASH_TOKEN_CACHE: dict = {}


def _token_hash60(tok: str) -> int:
    """60-bit token hash: first 15 md5 hex chars — replicable in ANSI SQL
    (per-char strpos fold), which is what makes the simhash dedups
    value-oracle-able in DuckDB.  Cached per process (the MinHasher
    ``_token_hashes`` pattern): boilerplate corpora re-use the same tokens
    millions of times, so each worker pays the md5 once per distinct token."""
    h = _SIMHASH_TOKEN_CACHE.get(tok)
    if h is None:
        h = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16)
        if len(_SIMHASH_TOKEN_CACHE) > 1_000_000:   # bound per-worker memory
            _SIMHASH_TOKEN_CACHE.clear()
        _SIMHASH_TOKEN_CACHE[tok] = h
    return h


def simhash60(text: str) -> int:
    """Classic SimHash over single-space tokens (unit weights), 60 bits.
    Vectorized over the token axis: hash all tokens, bit-unpack as an
    (n_tokens, 60) matrix, column-sum, take the sign.  Tokenization is
    ``split(' ')`` (empty pieces preserved) to match the SQL oracle."""
    toks = text.split(" ")
    cache = _SIMHASH_TOKEN_CACHE
    h = np.fromiter((cache.get(t) or _token_hash60(t) for t in toks),
                    dtype=np.uint64, count=len(toks))
    shifts = np.arange(SIMHASH_BITS, dtype=np.uint64)
    bits = (h[:, None] >> shifts[None, :]) & np.uint64(1)
    acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    return int(((acc > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))


def simhash60_batch(texts: list[str]) -> np.ndarray:
    """(n_docs,) uint64 — the whole batch in one pass, value-identical to
    ``[simhash60(t) for t in texts]`` (pinned by pytest).  All docs' token
    hashes concatenate into one buffer (shared md5 cache), the per-bit
    ±1 sums come from ONE segmented ``np.add.reduceat`` over the unpacked
    bit matrix (count-of-ones c → 2c − n_tokens), chunked so the
    (tokens × 60) temp stays cache-resident."""
    n_docs = len(texts)
    if n_docs == 0:
        return np.empty(0, dtype=np.uint64)
    toks_list = [t.split(" ") for t in texts]
    lens = np.fromiter((len(t) for t in toks_list), np.int64, n_docs)
    h = np.fromiter(
        (_SIMHASH_TOKEN_CACHE.get(t) or _token_hash60(t)
         for t in itertools.chain.from_iterable(toks_list)),
        dtype=np.uint64, count=int(lens.sum()))
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    shifts = np.arange(SIMHASH_BITS, dtype=np.uint64)
    acc = np.empty((n_docs, SIMHASH_BITS), dtype=np.int64)
    d0 = 0
    while d0 < n_docs:
        d1 = d0 + 1
        while d1 < n_docs and starts[d1] - starts[d0] <= 4096:
            d1 += 1
        end = starts[d1] if d1 < n_docs else len(h)
        seg = h[starts[d0]:end]
        bits = ((seg[:, None] >> shifts[None, :]) & np.uint64(1)) \
            .astype(np.int32)
        acc[d0:d1] = np.add.reduceat(bits, starts[d0:d1] - starts[d0],
                                     axis=0)
        d0 = d1
    signed = 2 * acc - lens[:, None]
    return ((signed > 0).astype(np.uint64) << shifts[None, :]) \
        .sum(axis=1, dtype=np.uint64)


def simhash_dedup(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Exact-signature SimHash dedup (hamming-0 grouping); see
    :func:`simhash_near_dedup` for the banded hamming-k variant."""
    def add_sig(batch: pa.Table) -> pa.Table:
        sigs = simhash60_batch(batch.column("text").to_pylist())
        return batch.append_column("simhash", pa.array(sigs, pa.uint64()))

    keyed = ds.map_batches(add_sig, batch_format="pyarrow")
    return keyed.groupby("simhash").map_groups(_first_per_group,
                                               batch_format="pyarrow")


def simhash_near_dedup(ds: ray.data.Dataset, hamming_k: int = 3,
                       bucket_pair_cap: int = 512,
                       hot_bucket_reps: int = 8) -> ray.data.Dataset:
    """Banded hamming-k SimHash near-dedup (the explode→groupby shape of
    MinHash-LSH, with hamming distance as the verifier).

    Pigeonhole: split the 64-bit signature into ``hamming_k + 1`` bands —
    two signatures within hamming distance k must agree exactly on at least
    one band, so grouping by (band, band_bits) generates a complete
    candidate set.  Candidates verify with a full 64-bit XOR popcount; a doc
    is a duplicate iff a verified pair links it to a smaller doc_id.  Only
    (band, band_bits, doc_id, simhash) rows shuffle — never text.

    The exchange groups by a 256-way COARSE bucket of the fine (band,
    band_bits) cell (the ``bucket_pairs_coarse`` pattern from MinHash-LSH:
    per-key map_groups dispatch — not shuffled bytes — is the measured
    bottleneck), and the verify is fully vectorized: per-run
    ``np.triu_indices`` pair generation, one XOR over the run's signature
    array, and an ``np.unpackbits`` popcount — no per-pair Python."""
    n_bands = hamming_k + 1
    # band bit boundaries: as equal as SIMHASH_BITS allows
    widths = [SIMHASH_BITS // n_bands + (1 if i < SIMHASH_BITS % n_bands else 0)
              for i in range(n_bands)]
    offsets = np.cumsum([0] + widths[:-1])

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id")
        n = len(texts)
        sigs = simhash60_batch(texts)
        bands_col, bits_col = [], []
        for bi in range(n_bands):
            mask = np.uint64((1 << widths[bi]) - 1)
            bits_col.append((sigs >> np.uint64(offsets[bi])) & mask)
            bands_col.append(np.full(n, bi, dtype=np.int32))
        band_all = np.concatenate(bands_col) if n else np.zeros(0, np.int32)
        bits_all = np.concatenate(bits_col) if n \
            else np.zeros(0, np.uint64)
        # coarse exchange key: 256 buckets of fine (band, band_bits) cells.
        # band_bits is only ~15 bits wide, so it MUST be multiplied up to
        # reach the extracted top byte — XORing the raw bits against
        # band*_MIX2 leaves byte 7 a function of the band alone (n_bands
        # buckets total, each carrying the whole corpus: the exact
        # single-task collapse this coarse key exists to prevent).
        pb = (((bits_all * _MIX1) ^ (band_all.astype(np.uint64) * _MIX2))
              >> np.uint64(56)).astype(np.int32)
        return pa.table({
            "band": pa.array(band_all),
            "band_bits": pa.array(bits_all, pa.uint64()),
            "__pb": pa.array(pb),
            "doc_id": pc.take(ids, pa.array(np.tile(np.arange(n), n_bands))),
            "simhash": pa.array(np.tile(sigs, n_bands), pa.uint64()),
        })

    def bucket_pairs_coarse(group: pa.Table) -> pa.Table:
        """All fine (band, band_bits) cells of one coarse bucket: sort,
        find cell runs, pair + hamming-verify each run vectorized.  Same
        pair semantics as the per-cell version (sorted unique ids; all
        pairs under the cap, smallest-``hot_bucket_reps`` star pattern
        over it; popcount(sig_a ^ sig_b) ≤ k)."""
        id_arr_type = group.column("doc_id").type
        t = group.sort_by([("band", "ascending"),
                           ("band_bits", "ascending")])
        band = t.column("band").to_numpy(zero_copy_only=False)
        bits = t.column("band_bits").to_numpy(zero_copy_only=False)
        ids_np = t.column("doc_id").to_numpy(zero_copy_only=False)
        sigs_np = t.column("simhash").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        empty = pa.table({"a_id": pa.array([], id_arr_type),
                          "b_id": pa.array([], id_arr_type)})
        if len(band) == 0:
            return empty
        change = np.flatnonzero((band[1:] != band[:-1])
                                | (bits[1:] != bits[:-1]))
        starts = np.r_[0, change + 1]
        ends = np.r_[change + 1, len(band)]
        a_parts, b_parts = [], []
        for s, e in zip(starts, ends):
            ids_r = ids_np[s:e]
            order = np.argsort(ids_r, kind="stable")
            ids_s = ids_r[order]
            sigs_s = sigs_np[s:e][order]
            if len(ids_s) > 1:                  # drop duplicate doc rows
                keep = np.r_[True, ids_s[1:] != ids_s[:-1]]
                ids_s, sigs_s = ids_s[keep], sigs_s[keep]
            n = len(ids_s)
            if n < 2:
                continue
            if n > bucket_pair_cap:
                reps = min(hot_bucket_reps, n - 1)
                iu = np.concatenate([np.full(n - 1 - i, i, dtype=np.int64)
                                     for i in range(reps)])
                ju = np.concatenate([np.arange(i + 1, n, dtype=np.int64)
                                     for i in range(reps)])
            else:
                iu, ju = np.triu_indices(n, 1)
            xor = sigs_s[iu] ^ sigs_s[ju]
            pop = np.unpackbits(xor[:, None].view(np.uint8),
                                axis=1).sum(axis=1)
            ok = pop <= hamming_k                       # verify in-bucket
            if ok.any():
                a_parts.append(ids_s[iu[ok]])
                b_parts.append(ids_s[ju[ok]])
        if not a_parts:
            return empty
        return pa.table({
            "a_id": pa.array(np.concatenate(a_parts)).cast(id_arr_type),
            "b_id": pa.array(np.concatenate(b_parts)).cast(id_arr_type)})

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    pairs = (exploded.groupby("__pb")
                     .map_groups(bucket_pairs_coarse, batch_format="pyarrow"))

    def dup_ids(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("b_id")})

    from .joins import broadcast_anti_join

    dup_keys = _distinct_on(pairs.map_batches(dup_ids, batch_format="pyarrow"),
                            ["doc_id"]).materialize()
    return broadcast_anti_join(ds, dup_keys, "doc_id")


# ---------------------------------------------------------------------------
# Embedding near-dup
# ---------------------------------------------------------------------------


def embedding_near_dedup(ds: ray.data.Dataset, threshold: float = 0.98,
                         n_planes: int = 16, n_tables: int = 3,
                         seed: int = 11, bucket_cap: int = 4096,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> ray.data.Dataset:
    """Cosine near-dup: ``n_tables`` INDEPENDENT seeded hyperplane plane
    sets (multi-table LSH — a pair at cosine ≥ 0.98 lands together in at
    least one table w.p. 1-(1-p^16)^3 where p = 1-acos(s)/π ≈ .96, i.e.
    recall ≈ 0.97 vs 0.52 single-table), exact cosine verify inside each
    bucket (capped at ``bucket_cap`` rows — a hot bucket verifies against
    its ``bucket_cap`` smallest ids instead of going quadratic), duplicate
    = any verified smaller-id partner in any table.  Only (table, bucket,
    id, vec) rows shuffle; duplicates found per table reduce to a
    distributed distinct id set and anti-join the input."""
    shifts = (1 << np.arange(n_planes, dtype=np.uint64))

    def add_buckets(batch: pa.Table) -> pa.Table:
        vecs = vectors_from_column(batch.column(vec_col))
        n = len(batch)
        dim = vecs.shape[1] if vecs.size else 0
        tables, buckets, idx = [], [], []
        for t in range(n_tables):
            rng = np.random.default_rng(seed + 1000 * t)
            planes = rng.standard_normal((dim, n_planes)) if dim \
                else np.zeros((0, n_planes))
            bits = (vecs @ planes) > 0 if n else np.zeros((0, n_planes), bool)
            b = (bits * shifts).sum(axis=1, dtype=np.uint64) if n \
                else np.zeros(0, np.uint64)
            tables.append(np.full(n, t, dtype=np.int32))
            buckets.append(b)
            idx.append(np.arange(n))
        take = pa.array(np.concatenate(idx)) if n else pa.array([], pa.int64())
        out = pa.table({
            "table": pa.array(np.concatenate(tables) if n else
                              np.zeros(0, np.int32)),
            "bucket": pa.array(np.concatenate(buckets) if n else
                               np.zeros(0, np.uint64), pa.uint64()),
            id_col: pc.take(batch.column(id_col), take),
            vec_col: pc.take(batch.column(vec_col), take),
        })
        return out

    def bucket_dups(group: pa.Table) -> pa.Table:
        ids = np.array(group.column(id_col).to_pylist())
        vecs = vectors_from_column(group.column(vec_col))
        order = np.argsort(ids)
        ids, vecs = ids[order], vecs[order]
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        n = len(ids)
        reps = min(n, bucket_cap)
        # verify each row against the bucket's `reps` smallest ids —
        # O(n·reps), exact for buckets under the cap
        sim = unit[:reps] @ unit.T
        dup = np.zeros(n, dtype=bool)
        for i in range(reps):
            dup[i + 1:] |= sim[i, i + 1:] >= threshold
        return pa.table({id_col: pa.array(ids[dup])})

    from .joins import broadcast_anti_join

    keyed = ds.map_batches(add_buckets, batch_format="pyarrow")
    dups = (keyed.groupby(["table", "bucket"])
                 .map_groups(bucket_dups, batch_format="pyarrow"))
    dup_keys = _distinct_on(dups, [id_col]).materialize()
    return broadcast_anti_join(ds, dup_keys, id_col)


# ---------------------------------------------------------------------------
# incremental dedup against a corpus snapshot
# ---------------------------------------------------------------------------


def incremental_dedup(ds: ray.data.Dataset,
                      is_new_col: str = "is_new") -> ray.data.Dataset:
    """Dedup NEW documents against an already-ingested corpus snapshot —
    the steady-state operation of a training-data pipeline (yesterday's
    100 TB is sealed; today's delta must not re-admit anything already
    seen, nor intra-delta duplicates).

    Input rows carry ``doc_id, text`` and an integer ``is_new_col``
    (0 = snapshot member, 1 = new).  One fingerprint shuffle resolves both
    rules at once: group by md5(text); a group containing any snapshot row
    drops all its new rows, otherwise the smallest-doc_id new row survives.
    Only 16-byte keys + ids cross the exchange per unique text, and the
    snapshot side could equally be a pre-sealed fingerprint table read
    directly — the join shape is identical."""

    def add_fp(batch: pa.Table) -> pa.Table:
        fps = md5_fingerprint(batch.column("text").to_pylist())
        return batch.append_column("fingerprint", pa.array(fps, pa.string()))

    def resolve(group: pa.Table) -> pa.Table:
        new_mask = pc.equal(group.column("is_new"), 1)
        if pc.any(pc.invert(new_mask)).as_py():
            return group.slice(0, 0).select(["doc_id", "text"])
        news = group.filter(new_mask)
        i = pc.index(pc.equal(news.column("doc_id"),
                              pc.min(news.column("doc_id"))), True).as_py()
        return news.slice(i, 1).select(["doc_id", "text"])

    return (ds.map_batches(add_fp, batch_format="pyarrow")
              .groupby("fingerprint")
              .map_groups(resolve, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# duplicate clustering: connected components over verified near-dup pairs
# ---------------------------------------------------------------------------


def dedup_clusters(ds: ray.data.Dataset, num_perm: int = 64, bands: int = 16,
                   threshold: float = 0.8, shingle_k: int = 3,
                   max_iters: int = 15,
                   broadcast_label_limit: int = 2_000_000,
                   driver_pairs_limit: int = 500_000
                   ) -> ray.data.Dataset:
    """Transitive near-duplicate clustering: every doc labeled with the
    smallest doc_id in its connected component of the verified-pair graph
    (A~B, B~C ⇒ {A,B,C} one cluster even when A~C itself is below
    threshold) — what a training pipeline needs to keep ONE representative
    per duplicate *family*, not merely drop pairwise partners.

    Adaptive two-path execution on the measured verified-pair count:
    ≤ ``driver_pairs_limit`` pairs run union-find on the driver (bounded
    bytes, exact same labels); beyond it, BSP min-label propagation —
    so the common case pays zero supersteps and the huge case never
    touches the driver.

    BSP min-label propagation over :func:`minhash_verified_pairs` edges:
    labels start as own id; each superstep stamps the source label onto
    its edges (the union + groupby(key) equi-join — Ray 2.49's chained
    native join breaks on schema-less empty partitions) and takes the min
    per node.  Converges in O(component diameter) supersteps — near-dup
    families are shallow, and each superstep shuffles only (node, label)
    pairs, never text.  The label sum is monotone decreasing, so a cheap
    scalar aggregate detects convergence.  Docs in no pair stay their own
    singleton cluster via a broadcast label lookup when the label table is
    ≤ ``broadcast_label_limit`` rows; above it the labels never touch the
    driver — attach runs through :func:`joins.shuffle_lookup_join` (both
    sides hash-partition on doc_id) with a LEFT join and singleton fill."""
    import ray

    pairs = minhash_verified_pairs(
        ds, num_perm=num_perm, bands=bands, threshold=threshold,
        shingle_k=shingle_k).materialize()

    def all_docs_self(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        return pa.table({"doc_id": ids, "cluster_id": ids})

    n_pairs = pairs.count()
    if n_pairs == 0:
        return ds.map_batches(all_docs_self, batch_format="pyarrow")

    id_type = dict(zip(pairs.schema().names, pairs.schema().types))["a_id"]

    if n_pairs <= driver_pairs_limit:
        # Adaptive small-graph path (the anti_join='auto' pattern): the
        # verified-pair set is ALREADY bounded and measured — at ≤ 16 B a
        # pair this is ≤ 8 MB on the driver, where union-find with path
        # compression beats O(diameter) BSP supersteps (each superstep is
        # two sort exchanges of the same edges).  The BSP path below
        # remains the >limit route, so nothing unbounded ever lands here.
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:        # path compression
                parent[x], x = root, parent[x]
            return root

        for row in pairs.iter_rows():
            ra, rb = find(row["a_id"]), find(row["b_id"])
            if ra != rb:
                # union by smaller label so the root IS the min id
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra

        nodes = list(parent.keys() | {find(k) for k in parent})
        lbl_nodes = pa.array(nodes, id_type)
        lbl_labels = pa.array([find(x) for x in nodes], id_type)
        lbl_ref_small = ray.put((lbl_nodes, lbl_labels))

        def attach_small(batch: pa.Table) -> pa.Table:
            nds, labs = ray.get(lbl_ref_small)
            ids = batch.column("doc_id").combine_chunks()
            pos = pc.index_in(ids, value_set=nds)
            got = pc.take(labs, pos)
            return pa.table({"doc_id": ids,
                             "cluster_id": pc.if_else(pc.is_valid(got), got,
                                                      ids.cast(id_type))})

        return ds.map_batches(attach_small, batch_format="pyarrow")

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch.column("a_id").combine_chunks()
        b = batch.column("b_id").combine_chunks()
        return pa.table({"src": pa.concat_arrays([a, b]),
                         "dst": pa.concat_arrays([b, a])})

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow").materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        res = batch.select(["src"]).group_by(["src"]).aggregate([])
        return pa.table({"node": res.column("src"),
                         "label": res.column("src")})

    labels = _distinct_on(
        edges.map_batches(init_labels, batch_format="pyarrow"),
        ["node", "label"]).materialize()

    def edge_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({"key": batch.column("src"),
                         "dst": batch.column("dst"),
                         "label": pa.nulls(n, id_type)})

    def label_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({"key": batch.column("node"),
                         "dst": pa.nulls(n, id_type),
                         "label": batch.column("label")})

    def stamp_min(group: pa.Table) -> pa.Table:
        lab = pc.min(group.column("label")).as_py()
        dst = group.column("dst")
        valid = pc.is_valid(dst)
        out_nodes = [group.column("key")[0].as_py()]
        out_nodes.extend(dst.filter(valid).to_pylist())
        return pa.table({"node": pa.array(out_nodes, id_type),
                         "label": pa.array([lab] * len(out_nodes), id_type)})

    def min_label(group: pa.Table) -> pa.Table:
        return pa.table({
            "node": group.column("node").slice(0, 1),
            "label": pa.array([pc.min(group.column("label")).as_py()],
                              id_type)})

    prev_sum = None
    for _ in range(max_iters):
        msgs = (edges.map_batches(edge_rows, batch_format="pyarrow")
                .union(labels.map_batches(label_rows,
                                          batch_format="pyarrow"))
                .groupby("key")
                .map_groups(stamp_min, batch_format="pyarrow"))
        labels = (msgs.groupby("node")
                  .map_groups(min_label, batch_format="pyarrow")).materialize()
        s = labels.sum("label")
        if s == prev_sum:
            break
        prev_sum = s

    n_labels = labels.count()
    if n_labels > broadcast_label_limit:
        # Large-graph attach: the label table is too big for the driver
        # (billions of rows at a realistic dup rate on a 10^12-doc corpus),
        # so it never lands there — both sides hash-partition on doc_id and
        # the label stamps inside each bucket (shuffle_lookup_join), then
        # unmatched docs (no dup pair) default to their own singleton label.
        from .joins import shuffle_lookup_join

        def relabel(batch: pa.Table) -> pa.Table:
            return pa.table({"doc_id": batch.column("node"),
                             "cluster_id": batch.column("label")})

        def ids_only(batch: pa.Table) -> pa.Table:
            return pa.table({"doc_id": batch.column("doc_id")})

        joined = shuffle_lookup_join(
            ds.map_batches(ids_only, batch_format="pyarrow"),
            labels.map_batches(relabel, batch_format="pyarrow"),
            on="doc_id", how="left",
            left_schema=pa.schema([("doc_id", id_type)]),
            right_schema=pa.schema([("doc_id", id_type),
                                    ("cluster_id", id_type)]))

        def fill_singletons(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").combine_chunks()
            got = batch.column("cluster_id").combine_chunks()
            return pa.table({"doc_id": ids,
                             "cluster_id": pc.if_else(pc.is_valid(got), got,
                                                      ids.cast(id_type))})

        return joined.map_batches(fill_singletons, batch_format="pyarrow")

    # bounded by broadcast_label_limit — safe to collect and broadcast once
    lbl = pa.concat_tables(list(labels.iter_batches(batch_format="pyarrow")),
                           promote_options="default")
    lbl_ref = ray.put((lbl.column("node").combine_chunks(),
                       lbl.column("label").combine_chunks()))

    def attach(batch: pa.Table) -> pa.Table:
        nodes, labs = ray.get(lbl_ref)
        ids = batch.column("doc_id").combine_chunks()
        pos = pc.index_in(ids, value_set=nodes)
        got = pc.take(labs, pos)
        return pa.table({"doc_id": ids,
                         "cluster_id": pc.if_else(pc.is_valid(got), got,
                                                  ids.cast(id_type))})

    return ds.map_batches(attach, batch_format="pyarrow")


def prefix_jaccard_pairs(ds: ray.data.Dataset, threshold=None,
                         num: int = 4, den: int = 5) -> ray.data.Dataset:
    """EXACT token-set similarity join via prefix filtering (the
    SSJoin/PPJoin family; Vernica et al., SIGMOD'10 MapReduce
    formulation): emit every unordered doc pair whose distinct-token
    Jaccard ≥ num/den, with the exact intersection and union sizes.

    Unlike :func:`minhash_verified_pairs` (probabilistic candidates),
    the prefix filter is LOSSLESS: order tokens by ascending global
    document frequency; a set of size s keeps the first
    ``s - ceil(t*s) + 1`` tokens as its prefix; any pair with J ≥ t
    must share a prefix token (overlap ≥ ceil(t*s) cannot hide entirely
    in either suffix), so grouping on prefix tokens plus a pairwise
    length filter (min ≥ t·max) loses nothing.  Exchanges carry
    (token, doc_id, set_size) triples and candidate id pairs — never
    text; verification stamps candidate texts by equi-key groupby (the
    minhash pattern) and computes set intersection/union exactly.

    threshold may be a float (converted to an exact fraction) or give
    num/den directly.
    """
    from fractions import Fraction

    from .joins import broadcast_semi_join
    if threshold is not None:
        fr = Fraction(threshold).limit_denominator(1000)
        num, den = fr.numerator, fr.denominator

    def tok_doc(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        out_t, out_d = [], []
        for did, tl in zip(ids, toks.to_pylist()):
            for t in set(tl):
                out_t.append(t)
                out_d.append(did)
        return pa.table({"tok": pa.array(out_t, pa.string()),
                         "doc_id": pa.array(out_d, pa.int64())})

    pairs_td = ds.map_batches(tok_doc, batch_format="pyarrow")

    def local_df(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["tok"]).aggregate([("tok", "count")])
        return pa.table({"tok": res.column("tok"),
                         "df": pc.cast(res.column("tok_count"),
                                       pa.int64())})

    from ..pipelines.analytics import partial_aggregate
    df = partial_aggregate(
        pairs_td.map_batches(local_df, batch_format="pyarrow"),
        ["tok"], [("df", "sum", "df")])
    from .joins import shuffle_lookup_join
    with_df = shuffle_lookup_join(
        pairs_td, df, on="tok", right_on="tok",
        left_schema=pa.schema([("tok", pa.string()),
                               ("doc_id", pa.int64())]),
        right_schema=pa.schema([("tok", pa.string()),
                                ("df", pa.int64())]),
        how="inner")

    # both wide steps group on 256-way coarse buckets of the fine key
    # (doc_id here, prefix token below) with the reduce side vectorized
    # over sorted runs — per-key map_groups dispatch, not shuffled bytes,
    # is the measured cost at high key cardinality
    def add_doc_bucket(batch: pa.Table) -> pa.Table:
        pd_ = (_hash_ids_u64(batch.column("doc_id").combine_chunks())
               >> np.uint64(56)).astype(np.int32)
        return batch.append_column("__pd", pa.array(pd_))

    def prefixes_coarse(group: pa.Table) -> pa.Table:
        t = group.sort_by([("doc_id", "ascending")])
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        toks = np.asarray(t.column("tok").to_pylist(), dtype=object)
        dfs = t.column("df").to_numpy(zero_copy_only=False)
        change = np.flatnonzero(ids[1:] != ids[:-1])
        starts = np.r_[0, change + 1]
        ends = np.r_[change + 1, len(ids)]
        out_t, out_d, out_s = [], [], []
        for s, e in zip(starts, ends):
            sz = e - s
            p = sz - (num * sz + den - 1) // den + 1
            seg_t, seg_df = toks[s:e], dfs[s:e]
            order = np.lexsort((seg_t, seg_df))[:p]
            out_t.append(seg_t[order])
            out_d.append(np.full(len(order), ids[s], np.int64))
            out_s.append(np.full(len(order), sz, np.int64))
        tok_out = np.concatenate(out_t) if out_t else \
            np.array([], dtype=object)
        # Coarse-bucket key: hash each DISTINCT prefix token once and fan the
        # value out through a dictionary encode — prefix tokens repeat across
        # docs (that is the whole point of prefix filtering), so per-value
        # hashing would re-blake2b the same hot tokens thousands of times.
        tok_arr = pa.array(tok_out, pa.string())
        dict_arr = tok_arr.dictionary_encode()
        uniq_pt = np.fromiter(
            (_stable_hash64(u) >> 56 for u in dict_arr.dictionary.to_pylist()),
            dtype=np.int32, count=len(dict_arr.dictionary))
        pt = uniq_pt[dict_arr.indices.to_numpy(zero_copy_only=False)] \
            if len(tok_arr) else np.array([], dtype=np.int32)
        return pa.table({
            "tok": tok_arr,
            "doc_id": pa.array(np.concatenate(out_d)
                               if out_d else [], pa.int64()),
            "set_size": pa.array(np.concatenate(out_s)
                                 if out_s else [], pa.int64()),
            "__pt": pa.array(pt)})

    pref = (with_df.map_batches(add_doc_bucket, batch_format="pyarrow")
            .groupby("__pd")
            .map_groups(prefixes_coarse, batch_format="pyarrow"))

    def bucket_pairs_coarse(group: pa.Table) -> pa.Table:
        t = group.sort_by([("tok", "ascending"), ("doc_id", "ascending")])
        tok = np.asarray(t.column("tok").to_pylist(), dtype=object)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        sz = t.column("set_size").to_numpy(zero_copy_only=False)
        change = np.flatnonzero(tok[1:] != tok[:-1])
        starts = np.r_[0, change + 1]
        ends = np.r_[change + 1, len(tok)]
        a_parts, b_parts = [], []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            ii, jj = np.triu_indices(n, k=1)
            lo = np.minimum(sz[s + ii], sz[s + jj])
            hi = np.maximum(sz[s + ii], sz[s + jj])
            keep = lo * den >= num * hi           # length filter
            a_parts.append(ids[s + ii[keep]])
            b_parts.append(ids[s + jj[keep]])
        if not a_parts:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64())})
        return pa.table({
            "a_id": pa.array(np.concatenate(a_parts), pa.int64()),
            "b_id": pa.array(np.concatenate(b_parts), pa.int64())})

    pairs = pref.groupby("__pt").map_groups(
        bucket_pairs_coarse, batch_format="pyarrow").materialize()

    def pair_ids(batch: pa.Table) -> pa.Table:
        both = pa.concat_arrays([batch.column("a_id").combine_chunks(),
                                 batch.column("b_id").combine_chunks()])
        return pa.table({"doc_id": both.unique()})

    cand_ids = pairs.map_batches(pair_ids, batch_format="pyarrow")
    cand_docs = broadcast_semi_join(ds, cand_ids, "doc_id")

    def verify_sets(ta: str, tb: str):
        sa, sb = set(ta.split(" ")), set(tb.split(" "))
        inter = len(sa & sb)
        union = len(sa | sb)
        return (inter, union) if inter * den >= num * union else None

    # Attach texts + verify via the shared coarse-bucketed equi-join tail
    # (see verify_pairs_by_text): exact set overlap once per distinct pair.
    return verify_pairs_by_text(
        pairs, cand_docs, pa.int64(), verify_sets,
        extra_fields=(("inter_size", pa.int64()),
                      ("union_size", pa.int64())))


def frequent_chunk_scrub(ds: ray.data.Dataset, chunk_tokens: int = 3,
                         max_df: int = 2,
                         broadcast_hot_limit: int = 2_000_000
                         ) -> ray.data.Dataset:
    """Cross-document boilerplate SCRUB (the C4/CCNet rule as a corpus
    REWRITE, not an audit): split every document into non-overlapping
    ``chunk_tokens``-token chunks, count each distinct chunk's document
    frequency corpus-wide, and re-emit every document with ALL occurrences
    of chunks appearing in more than ``max_df`` documents removed (the
    sub-chunk token tail is always kept).  Returns
    ``(doc_id, text, n_chunks, n_removed)`` — the scrubbed corpus.

    Scale shape: the df pass exchanges 16-byte blake2b chunk fingerprints
    with per-batch distinct-doc partial counts (each doc lives in one batch,
    so summed partials equal exact document frequency; chunk TEXT never
    crosses an exchange).  The hot set (df > max_df) is boilerplate by
    definition and therefore small relative to the corpus — it is counted
    first and broadcast (``ray.put`` once, ``pc.is_in`` per batch) when it
    fits ``broadcast_hot_limit``; above the limit the scrub switches to the
    shuffle path: all chunk-instance triples join the hot table on
    fingerprint (inner), per-doc hot positions fold into one row, and a
    left ``shuffle_lookup_join`` stamps them back onto the docs — nothing
    ever collects on the driver.
    """
    from ..pipelines.analytics import partial_aggregate
    from .joins import shuffle_lookup_join

    k = chunk_tokens
    ds = ds.map_batches(lambda b: b.select(["doc_id", "text"]),
                        batch_format="pyarrow")

    def _chunks(text: str) -> list[str]:
        toks = text.split(" ")
        return [" ".join(toks[i * k:(i + 1) * k]) for i in range(len(toks) // k)]

    def _fp(chunk: str, _c={}) -> bytes:
        h = _c.get(chunk)
        if h is None:
            if len(_c) > 1_000_000:     # bound per-worker memory
                _c.clear()
            h = _c[chunk] = hashlib.blake2b(chunk.encode("utf-8"),
                                            digest_size=16).digest()
        return h

    def df_partial(batch: pa.Table) -> pa.Table:
        counts: dict[bytes, int] = {}
        for text in batch.column("text").to_pylist():
            for fp in {_fp(c) for c in _chunks(text)}:
                counts[fp] = counts.get(fp, 0) + 1
        return pa.table({"fp": pa.array(list(counts.keys()), pa.binary()),
                         "df": pa.array(list(counts.values()), pa.int64())})

    df = partial_aggregate(ds.map_batches(df_partial, batch_format="pyarrow"),
                           ["fp"], [("df", "sum", "df")])
    # The hot table is the operator's bounded small side (16 B/fingerprint);
    # materializing it means the count below and the consuming path (collect
    # or join) execute the df chain once, not twice.
    hot = df.map_batches(
        lambda b: b.filter(pc.greater(b.column("df"), max_df)).select(["fp"]),
        batch_format="pyarrow").materialize()

    def _scrub_one(text: str, is_hot) -> tuple[str, int, int]:
        toks = text.split(" ")
        nc = len(toks) // k
        kept, removed = [], 0
        for i in range(nc):
            seg = toks[i * k:(i + 1) * k]
            if is_hot(" ".join(seg)):
                removed += 1
            else:
                kept.extend(seg)
        kept.extend(toks[nc * k:])
        return " ".join(kept), nc, removed

    def _out(rows_id, texts, hot_fn) -> pa.Table:
        out_t, out_c, out_r = [], [], []
        for text in texts:
            t2, nc, rm = _scrub_one(text, hot_fn)
            out_t.append(t2)
            out_c.append(nc)
            out_r.append(rm)
        return pa.table({"doc_id": rows_id,
                         "text": pa.array(out_t, pa.string()),
                         "n_chunks": pa.array(out_c, pa.int64()),
                         "n_removed": pa.array(out_r, pa.int64())})

    n_hot = hot.count()
    if n_hot <= broadcast_hot_limit:
        hot_tbl = pa.concat_tables(list(hot.iter_batches(batch_format="pyarrow")),
                                   promote_options="default") if n_hot else None
        hot_ref = ray.put(set(hot_tbl.column("fp").to_pylist()) if n_hot else set())

        def scrub_bcast(batch: pa.Table) -> pa.Table:
            hot_set = ray.get(hot_ref)
            return _out(batch.column("doc_id"),
                        batch.column("text").to_pylist(),
                        lambda c: _fp(c) in hot_set)

        return ds.map_batches(scrub_bcast, batch_format="pyarrow")

    # Shuffle path: hot set too big for the driver/broadcast — positions of
    # hot instances travel the exchanges instead.
    _sch = ds.schema()
    id_type = dict(zip(_sch.names, _sch.types))["doc_id"]

    def triples(batch: pa.Table) -> pa.Table:
        ids, poss, fps = [], [], []
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            for i, c in enumerate(_chunks(text)):
                ids.append(did)
                poss.append(i)
                fps.append(_fp(c))
        return pa.table({"doc_id": pa.array(ids, id_type),
                         "pos": pa.array(poss, pa.int64()),
                         "fp": pa.array(fps, pa.binary())})

    hot_inst = shuffle_lookup_join(
        ds.map_batches(triples, batch_format="pyarrow"), hot,
        on="fp", how="inner",
        left_schema=pa.schema([("doc_id", id_type), ("pos", pa.int64()),
                               ("fp", pa.binary())]),
        right_schema=pa.schema([("fp", pa.binary())]))

    def fold_positions(group: pa.Table) -> pa.Table:
        t = group.sort_by([("doc_id", "ascending"), ("pos", "ascending")])
        ids = t.column("doc_id").to_pylist()
        pos = t.column("pos").to_pylist()
        out_id, out_pos, cur, acc = [], [], None, []
        for d, p in zip(ids, pos):
            if d != cur:
                if cur is not None:
                    out_id.append(cur)
                    out_pos.append(",".join(map(str, acc)))
                cur, acc = d, []
            acc.append(p)
        if cur is not None:
            out_id.append(cur)
            out_pos.append(",".join(map(str, acc)))
        return pa.table({"doc_id": pa.array(out_id, id_type),
                         "hot_pos": pa.array(out_pos, pa.string())})

    per_doc = hot_inst.groupby("doc_id").map_groups(fold_positions,
                                                    batch_format="pyarrow")
    stamped = shuffle_lookup_join(
        ds, per_doc, on="doc_id", how="left",
        left_schema=pa.schema([("doc_id", id_type), ("text", pa.string())]),
        right_schema=pa.schema([("doc_id", id_type),
                                ("hot_pos", pa.string())]))

    def scrub_stamped(batch: pa.Table) -> pa.Table:
        out_rows = []
        for did, text, hp in zip(batch.column("doc_id").to_pylist(),
                                 batch.column("text").to_pylist(),
                                 batch.column("hot_pos").to_pylist()):
            hot_pos = set(int(x) for x in hp.split(",")) if hp else set()
            toks = text.split(" ")
            nc = len(toks) // k
            kept = []
            for i in range(nc):
                if i not in hot_pos:
                    kept.extend(toks[i * k:(i + 1) * k])
            kept.extend(toks[nc * k:])
            out_rows.append((did, " ".join(kept), nc, len(hot_pos)))
        return pa.table({
            "doc_id": pa.array([r[0] for r in out_rows], id_type),
            "text": pa.array([r[1] for r in out_rows], pa.string()),
            "n_chunks": pa.array([r[2] for r in out_rows], pa.int64()),
            "n_removed": pa.array([r[3] for r in out_rows], pa.int64())})

    return stamped.map_batches(scrub_stamped, batch_format="pyarrow")

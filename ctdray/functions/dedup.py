"""Deduplication operators over a document corpus, Ray-Data-first.

Five strategies, ordered by cost:

  exact_dedup           hash-partition on content fingerprint → first per group
  token_set_dedup       same, on the order/multiplicity-insensitive token set
  minhash_lsh_dedup     shingle → minhash → banded LSH buckets → candidate
                        pairs → exact-Jaccard verify → greedy keep-smallest
  simhash_dedup         64-bit simhash, exact-signature grouping
  embedding_near_dedup  cosine near-dup via seeded hyperplane LSH buckets

Scale notes (100 TB): every strategy shuffles only *small keys + ids* —
fingerprints (16 B), band hashes (8 B), signatures (8 B) — never the document
text; the one text-bearing step (Jaccard verification) touches only LSH
candidates, a vanishing fraction of the corpus, fetched by equi-join on
doc_id.  Groupbys pre-aggregate nothing (first-per-group is the aggregate),
so the exchange payload is the key set itself.
"""
from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

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
    """Near-dup modulo word order & repetition: key = sorted unique tokens."""
    return _keyed_dedup(ds, token_set_key, "token_set")


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


class MinHasher:
    """Word-shingle MinHash signatures. Deterministic across processes:
    shingle base hashes are blake2b-64 and the permutation family
    ((a*h + b) mod 2^61-1) is seeded numpy."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64).astype(object)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64).astype(object)
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def shingle_hashes(self, text: str) -> np.ndarray:
        toks = text.split()
        k = self.shingle_k
        if len(toks) < k:
            shingles = {" ".join(toks)} if toks else {""}
        else:
            shingles = {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}
        return np.array(sorted(_stable_hash64(s) for s in shingles), dtype=object)

    def signature(self, text: str) -> np.ndarray:
        h = self.shingle_hashes(text)
        # object dtype → Python big-int modmul, exact (no 64-bit overflow UB)
        sig = np.min((h[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE,
                     axis=1)
        return sig.astype(np.uint64)


def jaccard(a: str, b: str, k: int = 3) -> float:
    def sh(t):
        toks = t.split()
        if len(toks) < k:
            return {" ".join(toks)} if toks else {""}
        return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / max(1, len(sa | sb))


def minhash_lsh_dedup(ds: ray.data.Dataset, num_perm: int = 64, bands: int = 16,
                      threshold: float = 0.8, shingle_k: int = 3,
                      anti_join: str = "broadcast") -> ray.data.Dataset:
    """MinHash+LSH near-dedup; returns surviving (doc_id, text) rows.

    Stages: signature map_batches (stateful hasher per actor) → explode to
    (band, band_hash, doc_id) rows → groupby band key → candidate pairs →
    Jaccard verify (texts travel with the candidate rows; at 10^12 scale this
    becomes an equi-join on doc_id against the corpus instead) → a doc is a
    duplicate iff some verified pair links it to a smaller doc_id.
    """
    rows_per_band = num_perm // bands

    def signatures(batch: pa.Table) -> pa.Table:
        # per-worker hasher cache (stateless tasks — see stages.detect for
        # the compute-mode rationale; an autoscaling actor pool plateaus)
        key = ("minhash", num_perm, shingle_k)
        h = _TASK_HASHERS.get(key)
        if h is None:
            h = _TASK_HASHERS[key] = MinHasher(num_perm, shingle_k)
        out = {"band": [], "band_hash": [], "doc_id": []}
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            sig = h.signature(text)
            for b in range(bands):
                chunk = sig[b * rows_per_band:(b + 1) * rows_per_band]
                out["band"].append(b)
                out["band_hash"].append(
                    _stable_hash64(",".join(map(str, chunk))))
                out["doc_id"].append(doc_id)
        return pa.table({"band": pa.array(out["band"], pa.int32()),
                         "band_hash": pa.array(out["band_hash"], pa.uint64()),
                         "doc_id": pa.array(out["doc_id"])})

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group.column("doc_id").to_pylist()))
        a_id, b_id = [], []
        for ia, ib in itertools.combinations(ids, 2):
            a_id.append(ia); b_id.append(ib)
        return pa.table({"a_id": pa.array(a_id), "b_id": pa.array(b_id)})

    def first_pair(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    sigs = ds.map_batches(signatures, batch_format="pyarrow")
    # Only (band, band_hash, doc_id) triples shuffle — the corpus text never
    # enters the LSH exchange.
    pairs = (sigs.groupby(["band", "band_hash"])
                 .map_groups(bucket_pairs, batch_format="pyarrow"))
    # The same pair surfaces once per colliding band: dedupe before the
    # (expensive) exact-Jaccard verification.
    pairs = pairs.groupby(["a_id", "b_id"]).map_groups(first_pair,
                                                       batch_format="pyarrow")

    # Fetch candidate texts with a broadcast semi-join on the (small)
    # candidate id set; at extreme scale this becomes a shuffle equi-join,
    # but candidates are a vanishing fraction of the corpus by construction.
    import ray

    from .joins import broadcast_anti_join, broadcast_semi_join, \
        shuffle_anti_join

    pair_rows = pairs.take_all()
    cand_ids = {r["a_id"] for r in pair_rows} | {r["b_id"] for r in pair_rows}
    cand_docs = broadcast_semi_join(ds, cand_ids, "doc_id").take_all()
    text_ref = ray.put({r["doc_id"]: r["text"] for r in cand_docs})

    def verify(batch: pa.Table) -> pa.Table:
        texts = ray.get(text_ref)
        dup = [jaccard(texts[a], texts[b], shingle_k) >= threshold
               for a, b in zip(batch.column("a_id").to_pylist(),
                               batch.column("b_id").to_pylist())]
        return batch.append_column("is_dup", pa.array(dup, pa.bool_()))

    verified = pairs.map_batches(verify, batch_format="pyarrow")
    dup_rows = verified.filter(expr="is_dup == True")
    # doc with a verified smaller partner is a duplicate; b_id > a_id by
    # construction, so the duplicate set is exactly the distinct b_ids.
    dup_keys = dup_rows.map_batches(
        lambda b: pa.table({"doc_id": b.column("b_id")}),
        batch_format="pyarrow")
    if anti_join == "shuffle":
        # 10^12-doc path: dup set too large to broadcast — hash-partition
        # both sides on doc_id instead (one shuffle of the corpus).
        return shuffle_anti_join(ds, dup_keys, "doc_id")
    return broadcast_anti_join(ds, dup_keys, "doc_id")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """Classic 64-bit SimHash over whitespace tokens (unit weights)."""
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for tok in text.split():
        h = np.uint64(_stable_hash64(tok))
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_dedup(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Exact-signature SimHash dedup (hamming-0 grouping; banded hamming-k
    candidate generation follows the same explode→groupby shape as MinHash)."""
    def add_sig(batch: pa.Table) -> pa.Table:
        sigs = [simhash64(t) for t in batch.column("text").to_pylist()]
        return batch.append_column("simhash", pa.array(sigs, pa.uint64()))

    keyed = ds.map_batches(add_sig, batch_format="pyarrow")
    return keyed.groupby("simhash").map_groups(_first_per_group,
                                               batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Embedding near-dup
# ---------------------------------------------------------------------------


def embedding_near_dedup(ds: ray.data.Dataset, threshold: float = 0.98,
                         n_planes: int = 16, seed: int = 11,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> ray.data.Dataset:
    """Cosine near-dup: seeded random-hyperplane LSH buckets, exact cosine
    verify inside each bucket, keep the smallest id.  Only (bucket, id, vec)
    rows shuffle; at scale multiple independent plane sets raise recall."""
    def add_bucket(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        dim = vecs.shape[1] if vecs.size else 0
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((dim, n_planes)) if dim else np.zeros((0, n_planes))
        bits = (vecs @ planes) > 0
        bucket = (bits * (1 << np.arange(n_planes, dtype=np.uint64))).sum(axis=1,
                                                                          dtype=np.uint64)
        return batch.append_column("bucket", pa.array(bucket, pa.uint64()))

    def bucket_dedup(group: pa.Table) -> pa.Table:
        ids = np.array(group.column(id_col).to_pylist())
        vecs = np.array(group.column(vec_col).to_pylist(), dtype=np.float64)
        order = np.argsort(ids)
        ids, vecs = ids[order], vecs[order]
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        sim = unit @ unit.T
        dup = np.zeros(len(ids), dtype=bool)
        for i in range(len(ids)):
            if not dup[i]:
                dup[i + 1:] |= sim[i, i + 1:] >= threshold
        return group.take(pa.array(order[~dup]))

    keyed = ds.map_batches(add_bucket, batch_format="pyarrow")
    return keyed.groupby("bucket").map_groups(bucket_dedup, batch_format="pyarrow")

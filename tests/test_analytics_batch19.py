"""Batch 19: exact prefix-filtered Jaccard join, balanced per-lang
sampling, co-ordered part pairs."""
import hashlib
import itertools

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_prefix_jaccard_exact_vs_allpairs(ray_session, tmp_path):
    import ray.data

    from ctdray.functions.dedup import prefix_jaccard_pairs
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(12)]
    texts = []
    for i in range(30):
        k = rng.integers(4, 10)
        toks = list(rng.choice(vocab, size=k, replace=False))
        texts.append(" ".join(toks))
    # clones guarantee some >= 0.8 pairs
    texts[5] = texts[0]
    texts[17] = texts[9] + " " + texts[9].split()[0]
    t = pa.table({"doc_id": pa.array(range(30), pa.int64()),
                  "text": pa.array(texts)})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    ds = ray.data.read_parquet(str(tmp_path / "documents.parquet"))
    got = prefix_jaccard_pairs(ds, num=4, den=5).to_pandas()
    got_set = {(a, b, i, u) for a, b, i, u in
               zip(got.a_id, got.b_id, got.inter_size, got.union_size)}
    # brute-force oracle
    sets = [set(x.split()) for x in texts]
    want = set()
    for a, b in itertools.combinations(range(30), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if inter * 5 >= 4 * union:
            want.add((a, b, inter, union))
    assert want, "fixture must produce at least one qualifying pair"
    assert got_set == want


def test_lang_balanced_sample_order_and_cap(ray_session, tmp_path):
    from ctdray.pipelines.analytics import lang_balanced_sample
    n = 120
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "lang": pa.array(["en" if i % 3 else "fr" for i in range(n)]),
    }), str(tmp_path / "documents.parquet"))
    out = lang_balanced_sample(str(tmp_path), per_lang=5).to_pandas()
    assert sorted(out.lang.value_counts().to_dict().items()) == \
        [("en", 5), ("fr", 5)]
    for lang in ("en", "fr"):
        ids = [i for i in range(n)
               if (i % 3 != 0) == (lang == "en")]
        key = {i: int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)
               for i in ids}
        want = sorted(ids, key=lambda i: (key[i], i))[:5]
        sub = out[out.lang == lang].sort_values("sample_rank")
        assert list(sub.doc_id) == want
        assert list(sub.sample_rank) == [1, 2, 3, 4, 5]


def test_coordered_pairs_distinct_per_order(ray_session, tmp_path):
    from ctdray.pipelines.analytics import coordered_part_pairs
    pq.write_table(pa.table({
        # order 1: parts 1,2,2,3 -> pairs (1,2),(1,3),(2,3) once each
        # order 2: parts 1,2     -> (1,2)
        # order 3: part 9 alone  -> none
        "l_orderkey": pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
        "l_partkey": pa.array([1, 2, 2, 3, 1, 2, 9], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = coordered_part_pairs(str(tmp_path), n=10).to_pandas()
    got = {(a, b): c for a, b, c in
           zip(out.part_a, out.part_b, out.n_orders)}
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1}
    assert list(out.part_a)[0] == 1 and list(out.part_b)[0] == 2

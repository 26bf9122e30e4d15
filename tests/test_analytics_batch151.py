"""Batch 151: source Shapley, feature hashing sweep, linear probing,
minhash error."""
import hashlib

import pyarrow as pa
import pyarrow.parquet as pq

LCM20 = 232792560


def test_source_vocab_shapley(ray_session, tmp_path):
    from ctdray.pipelines.analytics import source_vocab_shapley
    pq.write_table(pa.table({
        "source": pa.array(["A", "B", "A"]),
        "text": pa.array(["x y", "y z", "x"]),
    }), str(tmp_path / "documents.parquet"))
    out = source_vocab_shapley(str(tmp_path)).to_pandas()
    # x:{A}, y:{A,B}, z:{B} -> each side: L + L/2
    exp = LCM20 + LCM20 // 2
    assert list(map(tuple, out.values)) == [
        ("A", 2, 1, exp), ("B", 2, 1, exp)]


def test_feature_hashing_collision_sweep(ray_session, tmp_path):
    from ctdray.pipelines.analytics import \
        feature_hashing_collision_sweep
    toks = ["alpha", "beta", "gamma", "delta", "epsilon"]
    pq.write_table(pa.table({
        "text": pa.array([" ".join(toks), "alpha beta"]),
    }), str(tmp_path / "documents.parquet"))
    out = feature_hashing_collision_sweep(str(tmp_path)).to_pandas()
    for _, row in out.iterrows():
        k = int(row["k_bits"])
        buckets = {}
        for t in toks:
            b = int(hashlib.md5(t.encode()).hexdigest()[:12], 16) \
                % (1 << k)
            buckets[b] = buckets.get(b, 0) + 1
        singles = sum(1 for c in buckets.values() if c == 1)
        assert row["vocab"] == 5
        assert row["occupied"] == len(buckets)
        assert row["singleton_buckets"] == singles
        assert row["collided_tokens"] == 5 - singles
        assert row["collision_ppm"] == (5 - singles) * 1_000_000 // 5


def test_linear_probing_cluster_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import \
        linear_probing_cluster_census
    keys = list(range(1, 9))
    pq.write_table(pa.table({
        "c_custkey": pa.array(keys, pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    out = linear_probing_cluster_census(str(tmp_path)).to_pandas()
    slots = sorted({int(hashlib.md5(str(k).encode()).hexdigest()[:12],
                        16) % 4096 for k in keys})
    runs, cur = [], 1
    for a, b in zip(slots, slots[1:]):
        if b == a + 1:
            cur += 1
        else:
            runs.append(cur)
            cur = 1
    runs.append(cur)
    row = out.iloc[0]
    assert row["n_keys"] == 8 and row["n_slots"] == 4096
    assert row["occupied"] == len(slots)
    assert row["n_runs"] == len(runs)
    assert row["longest_run"] == max(runs)


def test_source_minhash_jaccard_error(ray_session, tmp_path):
    from ctdray.pipelines.analytics import source_minhash_jaccard_error
    pq.write_table(pa.table({
        "source": pa.array(["A", "B"]),
        "text": pa.array(["a b c", "b c d"]),
    }), str(tmp_path / "documents.parquet"))
    out = source_minhash_jaccard_error(str(tmp_path)).to_pandas()
    # vocab fits inside k=32: the sketch is exact here
    assert list(map(tuple, out.values)) == [
        ("A", "B", 2, 4, 2, 500000, 500000, 0)]

"""Batch 147: water-filling allocation, rendezvous hashing,
quality/length kappa, weekly Fourier energy."""
import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_waterfill_fair_allocation(ray_session, tmp_path):
    from ctdray.pipelines.analytics import waterfill_fair_allocation
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_nationkey": pa.array([10, 20, 30], pa.int32()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([1] + [2] * 3 + [3] * 6, pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    out = waterfill_fair_allocation(str(tmp_path)).to_pandas()
    # demands [1,3,6], budget 5: f(2)=1+2+2=5<=5, f(3)=7>5 -> level 2
    assert list(map(tuple, out.values)) == [(3, 5, 2, 5, 2, 0)]


def test_rendezvous_hash_balance(ray_session, tmp_path):
    from ctdray.pipelines.analytics import rendezvous_hash_balance
    keys = [1, 2, 3, 4, 5, 6, 7]
    pq.write_table(pa.table({
        "c_custkey": pa.array(keys, pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    # independent reimplementation of the HRW rule
    exp8, exp9, stay = [0] * 9, [0] * 9, [0] * 9
    for k in keys:
        w = [int(hashlib.md5(f"{nd}-{k}".encode()).hexdigest()[:12], 16)
             for nd in range(9)]
        n8 = max(range(8), key=lambda nd: (w[nd], -nd))
        n9 = max(range(9), key=lambda nd: (w[nd], -nd))
        exp8[n8] += 1
        exp9[n9] += 1
        if n8 == n9:
            stay[n8] += 1
    out = rendezvous_hash_balance(str(tmp_path)).to_pandas()
    out = out.sort_values("node").reset_index(drop=True)
    assert list(out["node"]) == list(range(9))
    assert list(out["n_keys_8nodes"]) == exp8
    assert list(out["n_keys_9nodes"]) == exp9
    assert list(out["n_stayed"]) == stay
    assert sum(exp8) == len(keys) and sum(exp9) == len(keys)
    # HRW guarantee: keys only ever move TO the new node
    assert all(exp9[n] <= exp8[n] for n in range(8))


def test_quality_length_kappa_ppm(ray_session, tmp_path):
    from ctdray.pipelines.analytics import quality_length_kappa_ppm
    clean12 = " ".join(f"w{i}" for i in range(12))
    stop12 = "the the the the the the the w1 w2 w3 w4 w5"
    short5 = "aa bb cc dd ee"
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([short5, short5, stop12, clean12]),
        "n_chars": pa.array([100, 100, 250, 250], pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    out = quality_length_kappa_ppm(str(tmp_path)).to_pandas()
    # cells: c0=2 (fail,fail), c1=1 (fail,pass), c3=1 (pass,pass)
    # kappa = (4*3 - (3*2 + 1*2)) / (16 - 8) = 4/8 -> 500000 ppm
    assert list(map(tuple, out.values)) == [(4, 1, 0, 1, 2, 500000)]


def test_weekly_fourier_energy(ray_session, tmp_path):
    from ctdray.pipelines.analytics import weekly_fourier_energy
    pq.write_table(pa.table({
        "o_orderdate": pa.array(
            [_ts("2024-01-04T00:00"), _ts("2024-01-04T12:00"),
             _ts("2024-01-01T00:00")], pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    out = weekly_fourier_energy(str(tmp_path)).to_pandas()
    # epoch-day residues: 2024-01-04 -> r0 (c=1000,s=0) x2,
    # 2024-01-01 -> r4 (c=-901,s=-434)
    # cos=2000-901=1099, sin=-434, power=1099^2+434^2=1396157
    assert list(map(tuple, out.values)) == [(3, 1099, -434, 1396157)]

"""Batch 133: Elias-Fano plan, sharded top-k recall, rank/select
overhead, flatline runs."""
import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_elias_fano_plan(ray_session, tmp_path):
    from ctdray.pipelines.analytics import elias_fano_plan
    # keys {0,3,8,15}: U=16, l=2, lower 8, upper 4+4, buckets
    # {0,0,2,3}
    pq.write_table(pa.table({
        "o_orderkey": pa.array([0, 3, 8, 15, 3], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    out = elias_fano_plan(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(4, 16, 2, 8, 8, 3, 2)]


def _shard(c):
    return int(hashlib.md5(str(c).encode()).hexdigest()[:2], 16) % 16


def test_sharded_topk_recall(ray_session, tmp_path):
    from ctdray.pipelines.analytics import sharded_topk_recall
    a = [c for c in range(10_000) if _shard(c) == 0][:5]
    b = []
    used = {0}
    for c in range(10_000):
        if c in a:
            continue
        s = _shard(c)
        if s not in used:
            used.add(s)
            b.append(c)
        if len(b) == 7:
            break
    # shard-0 holds the top-5 spenders; its top-4 cut misses rank 5
    prices = [10.00, 9.99, 9.98, 9.97, 9.96,
              9.00, 8.99, 8.98, 8.97, 8.96, 8.95, 8.94]
    pq.write_table(pa.table({
        "o_custkey": pa.array(a + b, pa.int64()),
        "o_totalprice": pa.array(prices),
    }), str(tmp_path / "orders.parquet"))
    out = sharded_topk_recall(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(10, 4, 16, 11, 1)]


def test_rank_block_popcount_plan(ray_session, tmp_path):
    from ctdray.pipelines.analytics import rank_block_popcount_plan
    pq.write_table(pa.table({
        "l_orderkey": pa.array([0, 0, 1, 64, 64, 65, 65, 100],
                               pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = rank_block_popcount_plan(str(tmp_path)).to_pandas()
    # ones {0,64,65}; U=101 -> 2 blocks, pops 1 and 2
    assert list(map(tuple, out.values)) == [(101, 3, 2, 0, 2, 8, 4)]


def test_value_flatline_run_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import value_flatline_run_census
    # a: 1.0, 1.0 | 2.0 -> 2 runs; b: 5.0 | 5.0 merges across days
    pq.write_table(pa.table({
        "event_type": pa.array(["a", "a", "a", "b", "b"]),
        "ts": pa.array([_ts("2024-01-01T01:00"),
                        _ts("2024-01-01T02:00"),
                        _ts("2024-01-02T01:00"),
                        _ts("2024-01-01T03:00"),
                        _ts("2024-01-02T03:00")], pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "value": pa.array([1.0, 1.0, 2.0, 5.0, 5.0]),
    }), str(tmp_path / "events.parquet"))
    out = value_flatline_run_census(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [("a", 3, 2), ("b", 2, 1)]

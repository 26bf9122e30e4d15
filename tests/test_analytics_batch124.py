"""Batch 124: Merkle anti-entropy, Roaring containers, Grace hash
recursion, Bloom skip index."""
import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _lost(k):
    return int(hashlib.md5(str(k).encode()).hexdigest()[:2],
               16) % 16 == 0


def test_merkle_anti_entropy_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import merkle_anti_entropy_audit
    k_lost = next(k for k in range(512) if _lost(k))
    k_keep = next(k for k in range(512) if not _lost(k))
    k_keep2 = next(k for k in range(512, 1024) if not _lost(k))
    # leaf 0 loses a row -> differs; leaf 1 intact; shared parent 0
    pq.write_table(pa.table({
        "l_orderkey": pa.array([k_lost, k_keep, k_keep2], pa.int64()),
        "l_linenumber": pa.array([1, 1, 1], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = merkle_anti_entropy_audit(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(0, 2, 1), (1, 1, 1)]


def test_roaring_container_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import roaring_container_census
    # A: containers 0 (2 rows) and 8 (1 row) -> arrays, 4+2 bytes;
    # B: 4096 rows in container 0 -> one 8 KiB bitmap
    okeys = [1, 2, 70000] + list(range(4096))
    lns = [1, 1, 1] + [0] * 4096
    flags = ["A"] * 3 + ["B"] * 4096
    pq.write_table(pa.table({
        "l_orderkey": pa.array(okeys, pa.int64()),
        "l_linenumber": pa.array(lns, pa.int64()),
        "l_returnflag": pa.array(flags),
    }), str(tmp_path / "lineitem.parquet"))
    out = roaring_container_census(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        ("A", 2, 0, 6, 3), ("B", 0, 1, 8192, 4096)]


def _b12(k):
    h = hashlib.md5(str(k).encode()).hexdigest()
    return int(h[:2], 16) % 16, int(h[2:4], 16) % 16


def test_grace_hash_recursion_plan(ray_session, tmp_path):
    from ctdray.pipelines.analytics import grace_hash_recursion_plan
    k1 = 1
    k2 = next(k for k in range(2, 100) if _b12(k)[0] != _b12(k1)[0])
    # N=128 -> cap1 = 1279//128 = 9; both buckets overflow;
    # cap2 = 24//16 = 1; both level-2 cells (100, 28) overflow
    pq.write_table(pa.table({
        "l_partkey": pa.array([k1] * 100 + [k2] * 28, pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = grace_hash_recursion_plan(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (1, 16, 2, 100, 9), (2, 32, 2, 100, 1)]


def _pos(k, bits=60):
    h = hashlib.md5(str(k).encode()).hexdigest()
    return int(h[:2], 16) % bits, int(h[2:4], 16) % bits


def test_bloom_skip_index_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import bloom_skip_index_audit
    s1 = 1
    p1, p2 = _pos(s1)
    # s2: bloom word disjoint from s1's bits -> chunk skipped
    s2 = next(k for k in range(2, 1000)
              if not ({p1, p2} & set(_pos(k))))
    # s3 covers p1, s4 covers p2 -> chunk falsely matches
    s3 = next(k for k in range(2, 5000)
              if p1 in _pos(k) and k != s2)
    s4 = next(k for k in range(2, 5000)
              if p2 in _pos(k) and k not in (s2, s3))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([s1, s2], pa.int64()),
        "s_acctbal": pa.array([-1.00, 5.00]),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([0, 1024, 2048, 2049], pa.int64()),
        "l_suppkey": pa.array([s1, s2, s3, s4], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = bloom_skip_index_audit(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(1, 3, 1, 1, 1)]

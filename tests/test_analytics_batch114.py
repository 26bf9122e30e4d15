"""Batch 114: split leakage, heaviest-edge hooking, log2 repeat
mass, extrema census."""
import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def _split_of(doc_id):
    b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:2], 16) % 10
    return 0 if b < 8 else (1 if b == 8 else 2)


def test_split_leakage_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import split_leakage_audit
    # find one doc id per split and give all three the same 8-token
    # prefix -> every split pair leaks exactly one group
    ids = {}
    for i in range(200):
        s = _split_of(i)
        if s not in ids:
            ids[s] = i
        if len(ids) == 3:
            break
    prefix = "t0 t1 t2 t3 t4 t5 t6 t7"
    pq.write_table(pa.table({
        "doc_id": pa.array([ids[0], ids[1], ids[2]], pa.int64()),
        "text": pa.array([f"{prefix} tailA", f"{prefix} tailB",
                          f"{prefix} tailC"]),
    }), str(tmp_path / "documents.parquet"))
    out = split_leakage_audit(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (0, 1, 1), (0, 2, 1), (1, 2, 1)]


def test_coorder_heaviest_edge_hooking(ray_session, tmp_path):
    from ctdray.pipelines.analytics import coorder_heaviest_edge_hooking
    # edge 1-2 weight 2 (two shared orders), edge 2-3 weight 1:
    # nodes 1,2 pick each other at w=2 (mutual); node 3 picks 2 at
    # w=1 (not mutual)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10, 11, 11, 20, 20], pa.int64()),
        "l_partkey": pa.array([1, 2, 1, 2, 2, 3], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = coorder_heaviest_edge_hooking(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(1, 1, 0), (2, 2, 1)]


def test_doc_repeat_mass_log2(ray_session, tmp_path):
    from ctdray.pipelines.analytics import doc_repeat_mass_log2
    # "a"*4 + "b": mass = 4*2 = 8 -> bucket 0; "a"*16: 16*4 = 64 ->
    # bucket 4; all-distinct doc: mass 0 -> bucket 0
    pq.write_table(pa.table({
        "text": pa.array(["a a a a b", " ".join(["a"] * 16), "x y z"]),
    }), str(tmp_path / "documents.parquet"))
    out = doc_repeat_mass_log2(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(0, 2), (4, 1)]


def test_daily_revenue_extrema_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import daily_revenue_extrema_census
    # revs 10, 30, 20, 40, 5: local maxima at days 2 and 4, local
    # minimum at day 3 (endpoints excluded)
    pq.write_table(pa.table({
        "o_orderdate": pa.array([_ts(f"1995-01-0{d}")
                                 for d in range(1, 6)],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([0.10, 0.30, 0.20, 0.40, 0.05]),
    }), str(tmp_path / "orders.parquet"))
    out = daily_revenue_extrema_census(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(1995, 2, 1, 5)]

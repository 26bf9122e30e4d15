"""Batch 148: bipartite butterflies, MLM masking plan, business-day
ship lag, Hoover index."""
import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_bipartite_butterfly_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import bipartite_butterfly_census
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([11, 22, 33], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "l_partkey": pa.array([101, 102, 101, 102, 101], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = bipartite_butterfly_census(str(tmp_path)).to_pandas()
    # deg(p101)=3, deg(p102)=2 -> wedges 3+1=4; pair (11,22) shares
    # both parts -> 1 butterfly
    assert list(map(tuple, out.values)) == [(3, 2, 5, 4, 1)]


def test_mlm_masking_plan_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import mlm_masking_plan_census
    docs = {1: "aa bb cc dd ee ff gg hh", 2: "xx yy zz"}
    pq.write_table(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values())),
    }), str(tmp_path / "documents.parquet"))
    tot = mk = mt = mr = kp = 0
    for did, tx in docs.items():
        n = len(tx.split(" "))
        tot += n
        for i in range(1, n + 1):
            h = hashlib.md5(f"{did}-{i}".encode()).hexdigest()
            if int(h[:8], 16) % 100 < 15:
                mk += 1
                pol = int(h[8:12], 16) % 10
                mt += pol <= 7
                mr += pol == 8
                kp += pol == 9
    out = mlm_masking_plan_census(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(tot, mk, mt, mr, kp)]
    assert mk == mt + mr + kp


def test_order_ship_busday_lag_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import order_ship_busday_lag_hist
    # 2024-01-01 is a Monday
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderdate": pa.array([_ts("2024-01-01T00:00")] * 3,
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 3], pa.int64()),
        "l_shipdate": pa.array(
            [_ts("2024-01-01T00:00"),     # same day -> 0
             _ts("2024-01-05T00:00"),     # Mon -> Fri = 4 busdays
             _ts("2024-01-08T00:00")],    # next Mon = 5 (weekend free)
            pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = order_ship_busday_lag_hist(str(tmp_path)).to_pandas()
    got = sorted(map(tuple, out.values))
    assert got == [(0, 1), (4, 1), (5, 1)]


def test_nation_revenue_hoover_ppm(ray_session, tmp_path):
    from ctdray.pipelines.analytics import nation_revenue_hoover_ppm
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_nationkey": pa.array([10, 20], pa.int32()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 2, 2], pa.int64()),
        "o_totalprice": pa.array([1.0, 2.0, 1.0]),
    }), str(tmp_path / "orders.parquet"))
    out = nation_revenue_hoover_ppm(str(tmp_path)).to_pandas()
    # xs=[100,300] cents, dev=|200-400|+|600-400|=400,
    # hoover=400e6//1600=250000
    assert list(map(tuple, out.values)) == [(2, 400, 400, 250000)]

"""Batch 123: cluster-vs-row sampling audit, selectivity independence,
KMV monthly distinct audit, revenue sign motifs."""
import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def _h8(x):
    return int(hashlib.md5(str(x).encode()).hexdigest()[:2], 16) % 8


def test_cluster_sample_estimator_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import cluster_sample_estimator_audit
    # k1: in-sample chunk AND in-sample row; k2: neither
    k1 = next(k for k in range(10_000)
              if _h8(k // 64) == 0 and _h8(k) == 0)
    k2 = next(k for k in range(10_000)
              if _h8(k // 64) != 0 and _h8(k) != 0)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([k1, k2], pa.int64()),
        "o_totalprice": pa.array([1.00, 3.00], pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    out = cluster_sample_estimator_audit(str(tmp_path)).to_pandas()
    # total 400 cents; both estimators see only k1 -> 8*100 = 800;
    # err = 1e6*400//400 = 1_000_000 ppm
    assert list(map(tuple, out.values)) == [
        ("400", "800", "800", 1_000_000, 1_000_000)]


def test_selectivity_independence_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import selectivity_independence_audit
    # flags per row: (1,1,1), (0,0,0), (1,0,1), (0,1,0)
    pq.write_table(pa.table({
        "l_quantity": pa.array([30.0, 10.0, 30.0, 10.0]),
        "l_discount": pa.array([0.05, 0.00, 0.00, 0.05]),
        "l_shipdate": pa.array([_ts("1996-01-01"), _ts("1995-01-01"),
                                _ts("1996-06-01"), _ts("1995-06-01")],
                               pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = selectivity_independence_audit(str(tmp_path)).to_pandas()
    # AB: 1*4 vs 2*2 -> 0; AC: 2*4 vs 2*2 -> +, 1e6*4//4; BC: 0
    assert list(map(tuple, out.values)) == [
        ("AB", 2, 2, 1, 0, 0),
        ("AC", 2, 2, 2, 1, 1_000_000),
        ("BC", 2, 2, 1, 0, 0)]


def _h48(u):
    return int(hashlib.md5(str(u).encode()).hexdigest()[:12], 16)


def test_kmv_monthly_distinct_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import kmv_monthly_distinct_audit
    # Jan: 2 users (n < k -> est = n, kth = max hash); Feb: 9 users
    jan_users = [1, 2]
    feb_users = list(range(10, 19))
    rows_u = jan_users + [1] + feb_users  # dup user 1 in Jan
    rows_t = ([_ts("2024-01-05"), _ts("2024-01-06"), _ts("2024-01-07")]
              + [_ts("2024-02-10")] * 9)
    pq.write_table(pa.table({
        "ts": pa.array(rows_t, pa.timestamp("us")),
        "user_id": pa.array(rows_u, pa.int64()),
    }), str(tmp_path / "events.parquet"))
    out = kmv_monthly_distinct_audit(str(tmp_path)).to_pandas()
    h_jan = max(_h48(u) for u in jan_users)
    h_feb = sorted(_h48(u) for u in feb_users)[7]
    assert list(map(tuple, out.values)) == [
        (np.datetime64("2024-01-01", "us"), 2, h_jan, 2),
        (np.datetime64("2024-02-01", "us"), 9, h_feb,
         7 * (1 << 48) // h_feb)]


def test_revenue_sign_motif_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import revenue_sign_motif_census
    # day revenues 100, 200, 200, 150 cents -> signs +1, 0, -1
    # -> one motif: (1+1)*9 + (0+1)*3 + (-1+1) = 21
    pq.write_table(pa.table({
        "o_orderdate": pa.array([_ts("2024-01-01"), _ts("2024-01-02"),
                                 _ts("2024-01-03"), _ts("2024-01-04")],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([1.00, 2.00, 2.00, 1.50]),
    }), str(tmp_path / "orders.parquet"))
    out = revenue_sign_motif_census(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(21, 1)]

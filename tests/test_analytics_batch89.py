"""Batch 89: RRF ranking fusion, co-order k-core peel, 30-day
fulfillment SLA by month, supplier lead-time variance top-k."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_customer_rrf_top10(ray_session, tmp_path):
    from ctdray.pipelines.analytics import customer_rrf_top10
    # cust 1: 2 orders of 10.0 (rev 2000c, cnt 2)
    # cust 2: 1 order of 30.0 (rev 3000c, cnt 1)
    # rev ranks: 2->1, 1->2; cnt ranks: 1->1, 2->2
    # rrf(1) = 1e6//62 + 1e6//61; rrf(2) = 1e6//61 + 1e6//62 (tie -> key)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
        "o_totalprice": pa.array([10.0, 10.0, 30.0]),
    }), str(tmp_path / "orders.parquet"))
    out = customer_rrf_top10(str(tmp_path)).to_pandas()
    assert list(out.o_custkey) == [1, 2]
    expected = 1_000_000 // 61 + 1_000_000 // 62
    assert list(out.rrf_score) == [expected, expected]


def test_coorder_kcore_peel(ray_session, tmp_path):
    from ctdray.pipelines.analytics import coorder_kcore_peel
    # order 1: parts {1,2,3} (triangle); order 2: parts {3,4}
    # k=2 round 1: degs 1:2 2:2 3:3 4:1 -> drop 4, edges = triangle
    # round 2: triangle stable (all deg 2)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "l_partkey": pa.array([1, 2, 3, 3, 4], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = coorder_kcore_peel(str(tmp_path), k=2).to_pandas()
    assert list(out["round"]) == [1, 2]
    assert list(out.n_nodes) == [3, 3]
    assert list(out.n_edges) == [3, 3]


def test_order_fulfill_30d_share_by_month(ray_session, tmp_path):
    from ctdray.pipelines.analytics import order_fulfill_30d_share_by_month
    # order 1 (Jan): lags 5, 40 -> max 40 (miss)
    # order 2 (Jan): lag 10 -> ok ; Jan share = 500000
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array([_ts("2024-01-01"), _ts("2024-01-10")],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_shipdate": pa.array([_ts("2024-01-06"), _ts("2024-02-10"),
                                _ts("2024-01-20")], pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = order_fulfill_30d_share_by_month(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert out.n_orders[0] == 2
    assert out.n_ok[0] == 1
    assert out.ok_ppm[0] == 500_000


def test_supplier_leadtime_variance_topk(ray_session, tmp_path):
    from ctdray.pipelines.analytics import supplier_leadtime_variance_topk
    # supp 1: lags 0, 10 -> var_num = 2*100 - 100 = 100
    # supp 2: lags 5, 5 -> var_num = 2*50 - 100 = 0
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_orderdate": pa.array([_ts("2024-01-01")] * 4,
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "l_suppkey": pa.array([1, 1, 2, 2], pa.int64()),
        "l_shipdate": pa.array([_ts("2024-01-01"), _ts("2024-01-11"),
                                _ts("2024-01-06"), _ts("2024-01-06")],
                               pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = supplier_leadtime_variance_topk(str(tmp_path)).to_pandas()
    assert list(out.l_suppkey) == [1, 2]
    assert list(out.var_num) == ["100", "0"]
    assert list(out.n_lines) == [2, 2]

"""Batch 128: seasonal-naive backtest, kNN-1 hubness, cascade delete
impact, sort-layout pruning."""
import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_seasonal_naive_backtest(ray_session, tmp_path):
    from ctdray.pipelines.analytics import seasonal_naive_backtest
    # Mondays 100 -> 250 -> 50 (errors 150, 200); lone Tuesday 300
    pq.write_table(pa.table({
        "o_orderdate": pa.array([_ts("2024-01-01"), _ts("2024-01-08"),
                                 _ts("2024-01-09"), _ts("2024-01-15")],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([1.00, 2.50, 3.00, 0.50]),
    }), str(tmp_path / "orders.parquet"))
    out = seasonal_naive_backtest(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(1, 2, 350)]


def test_knn1_hubness_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import knn1_hubness_hist
    def vec(d, x):
        v = np.zeros(64, np.float32)
        v[d] = x
        return v
    # subset {0, 8, 16}: NN(0)=8, NN(8)=0, NN(16)=0 (tie -> smaller)
    pq.write_table(pa.table({
        "vec_id": pa.array([0, 1, 8, 16], pa.int64()),
        "embedding": pa.array([vec(0, 1.0), vec(5, 1.0), vec(0, 0.9),
                               vec(1, 1.0)], pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))
    out = knn1_hubness_hist(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(0, 1), (1, 1), (2, 1)]


def _coh32(k):
    return int(hashlib.md5(str(k).encode()).hexdigest()[:2],
               16) % 32 == 0


def test_cascade_delete_impact(ray_session, tmp_path):
    from ctdray.pipelines.analytics import cascade_delete_impact
    c_in = next(c for c in range(1000) if _coh32(c))
    c_out = next(c for c in range(1000) if not _coh32(c))
    pq.write_table(pa.table({
        "c_custkey": pa.array([c_in, c_out], pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([c_in, c_in, c_out], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = cascade_delete_impact(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(1, 2, 3, 750_000)]


def test_sort_layout_pruning_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import sort_layout_pruning_audit
    pq.write_table(pa.table({
        "o_orderkey": pa.array([0, 1, 512], pa.int64()),
        "o_orderdate": pa.array([_ts("1995-06-01"), _ts("1994-06-01"),
                                 _ts("1994-07-01")],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    out = sort_layout_pruning_audit(str(tmp_path)).to_pandas()
    # date layout isolates the 1995 row in its own chunk; okey layout
    # drags a 1994 row along
    assert list(map(tuple, out.values)) == [
        ("date", 3, 1, 1, 1), ("okey", 2, 1, 2, 1)]

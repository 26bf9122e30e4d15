"""Batch 141: Hilbert vs Z-order locality, cache admission plan,
skip-gram pairs, revenue max drawdown."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_hilbert_vs_zorder_locality(ray_session, tmp_path):
    from ctdray.pipelines.analytics import hilbert_vs_zorder_locality
    # occupy cells (0,0),(0,1),(1,0),(1,1): doy 16 -> y=0, doy 1 -> 1
    pq.write_table(pa.table({
        "o_custkey": pa.array([0, 1, 0, 1], pa.int64()),
        "o_orderdate": pa.array(
            [_ts("1992-01-16T00:00"), _ts("1992-01-16T00:00"),
             _ts("1992-01-01T00:00"), _ts("1992-01-01T00:00")],
            pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    out = hilbert_vs_zorder_locality(str(tmp_path)).to_pandas()
    # z visits (0,0),(0,1),(1,0),(1,1): 1+2+1; hilbert walks unit
    assert list(map(tuple, out.values)) == [
        ("zorder", 4, 4), ("hilbert", 4, 3)]


def test_cache_admission_knapsack_plan(ray_session, tmp_path):
    from ctdray.pipelines.analytics import \
        cache_admission_knapsack_plan
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
        "p_size": pa.array([10, 8, 2, 7], pa.int32()),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2, 3], pa.int64()),
        "l_extendedprice": pa.array([2.0, 3.0, 4.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = cache_admission_knapsack_plan(str(tmp_path)).to_pandas()
    # sizes 10+8+2=20, budget 2 -> only part 3 (densest) fits
    assert list(map(tuple, out.values)) == [
        (3, 2, 1, 2, 400, 444444)]


def test_skipgram_window_pairs_topk(ray_session, tmp_path):
    from ctdray.pipelines.analytics import skipgram_window_pairs_topk
    pq.write_table(pa.table({
        "text": pa.array(["a b c d", "a b"]),
    }), str(tmp_path / "documents.parquet"))
    out = skipgram_window_pairs_topk(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        ("a", "b", 2), ("a", "c", 1), ("a", "d", 1),
        ("b", "c", 1), ("b", "d", 1), ("c", "d", 1)]


def test_daily_revenue_max_drawdown(ray_session, tmp_path):
    from ctdray.pipelines.analytics import daily_revenue_max_drawdown
    days = ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]
    pq.write_table(pa.table({
        "o_orderdate": pa.array([_ts(f"{d}T00:00") for d in days],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([5.0, 2.0, 4.0, 1.0]),
    }), str(tmp_path / "orders.parquet"))
    out = daily_revenue_max_drawdown(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (4, 500, 400, "2024-01-04")]

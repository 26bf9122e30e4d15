"""Batch 135: join-order planner, linear counting, count-sketch,
D'Hondt vs largest-remainder seats."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_join_order_dp_plan(ray_session, tmp_path):
    from ctdray.pipelines.analytics import join_order_dp_plan
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([10], pa.int64()),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([100, 101, 102], pa.int64()),
        "o_custkey": pa.array([1, 2, 9], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([100, 100, 102, 999], pa.int64()),
        "l_partkey": pa.array([10, 11, 10, 10], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = join_order_dp_plan(str(tmp_path)).to_pandas()
    # |CO|=2 |OL|=3 |LP|=3 |COL|=2 |OLP|=2
    assert list(map(tuple, out.values)) == [
        ("CO_L_P", 4, 1), ("LP_O_C", 5, 0),
        ("OL_C_P", 5, 0), ("OL_P_C", 5, 0)]


def test_linear_counting_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import linear_counting_audit
    # users 19 and 24 share md5 bucket 31; user 1 lands at 196
    pq.write_table(pa.table({
        "ts": pa.array([_ts("2024-01-01T00:00")] * 4 +
                       [_ts("2024-02-01T00:00")], pa.timestamp("us")),
        "user_id": pa.array([19, 24, 1, 19, 2], pa.int64()),
    }), str(tmp_path / "events.parquet"))
    out = linear_counting_audit(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        ("2024-01", 3, 2, 254, 1), ("2024-02", 1, 1, 255, 0)]


def test_countsketch_sign_estimates(ray_session, tmp_path):
    from ctdray.pipelines.analytics import countsketch_sign_estimates
    pq.write_table(pa.table({
        "text": pa.array(["a a a b", "b c a", "d d"]),
    }), str(tmp_path / "documents.parquet"))
    out = countsketch_sign_estimates(str(tmp_path)).to_pandas()
    # 4 distinct tokens, no bucket collisions -> estimates exact
    assert list(map(tuple, out.values)) == [
        ("a", 4, 4), ("b", 2, 2), ("d", 2, 2), ("c", 1, 1)]


def test_dhondt_seat_allocation(ray_session, tmp_path):
    from ctdray.pipelines.analytics import dhondt_seat_allocation
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int32()),
        "n_name": pa.array(["ALPHA", "BETA", "GAMMA"]),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_nationkey": pa.array([0, 1, 2], pa.int32()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 2, 3], pa.int64()),
        "o_totalprice": pa.array([61.00, 21.00, 18.00]),
    }), str(tmp_path / "orders.parquet"))
    out = dhondt_seat_allocation(str(tmp_path)).to_pandas()
    # cents 6100/2100/1800: D'Hondt 40/13/11, Hamilton 39/13/12
    assert list(map(tuple, out.values)) == [
        ("ALPHA", 40, 39, 1), ("BETA", 13, 13, 0),
        ("GAMMA", 11, 12, -1)]

"""Batch 36: value trend classification, multi-nation parts, raw-fact
top-k, weekend share."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_value_trend(ray_session, tmp_path):
    from ctdray.pipelines.analytics import customer_value_trend_counts
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "o_custkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "o_orderdate": pa.array(
            [_ts("1995-01-01"), _ts("1995-06-01"), _ts("1995-01-01"),
             _ts("1995-06-01"), _ts("1995-01-01")],
            pa.timestamp("us")),
        # cust1: 10 -> 20 up; cust2: 30 -> 5 down; cust3 single = flat
        "o_totalprice": pa.array([10.0, 20.0, 30.0, 5.0, 7.0]),
    }), str(tmp_path / "orders.parquet"))
    out = customer_value_trend_counts(str(tmp_path)).to_pandas()
    assert (out.n_up[0], out.n_down[0], out.n_flat[0]) == (1, 1, 1)


def test_multi_nation_parts(ray_session, tmp_path):
    from ctdray.pipelines.analytics import parts_multi_nation
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_nationkey": pa.array([0, 1, 2], pa.int64()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        # part 9 via 3 nations; part 8 via 1
        "l_partkey": pa.array([9, 9, 9, 8], pa.int64()),
        "l_suppkey": pa.array([1, 2, 3, 1], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = parts_multi_nation(str(tmp_path)).to_pandas()
    assert list(out.l_partkey) == [9] and list(out.n_nations) == [3]


def test_top_value_events(ray_session, tmp_path):
    from ctdray.pipelines.analytics import top_value_events
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([_ts("2024-01-01")] * 3, pa.timestamp("us")),
        "user_id": pa.array([7, 8, 9], pa.int64()),
        # tie on 5.00 between events 1 and 3 -> event 1 first
        "event_type": pa.array(["x", "y", "z"]),
        "value": pa.array([5.0, 2.0, 5.0]),
    }), str(tmp_path / "events.parquet"))
    out = top_value_events(str(tmp_path), n=2).to_pandas()
    assert list(out.event_id) == [1, 3]
    assert list(out.value_cents) == [500, 500]


def test_weekend_share(ray_session, tmp_path):
    from ctdray.pipelines.analytics import event_weekend_share_ppm
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        # 2024-01-06 is a Saturday; 2024-01-08 a Monday
        "ts": pa.array([_ts("2024-01-06T10:00"),
                        _ts("2024-01-08T10:00")], pa.timestamp("us")),
        "user_id": pa.array([0, 0], pa.int64()),
        "event_type": pa.array(["x", "x"]),
        "value": pa.array([3.0, 1.0]),
    }), str(tmp_path / "events.parquet"))
    out = event_weekend_share_ppm(str(tmp_path)).to_pandas()
    assert out.weekend_cents[0] == 300 and out.total_cents[0] == 400
    assert out.weekend_share_ppm[0] == 750_000

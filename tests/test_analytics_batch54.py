"""Batch 54: hourly OHLC, daily TWAP, interval self-overlap, Borda
rank aggregation."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_events_hourly_ohlc(ray_session, tmp_path):
    from ctdray.pipelines.analytics import events_hourly_ohlc
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([_ts("2024-01-01T10:05"), _ts("2024-01-01T10:20"),
                        _ts("2024-01-01T10:40")], pa.timestamp("us")),
        "user_id": pa.array([1] * 3, pa.int64()),
        "event_type": pa.array(["a"] * 3),
        "value": pa.array([3.0, 9.0, 1.0]),
    }), str(tmp_path / "events.parquet"))
    out = events_hourly_ohlc(str(tmp_path)).to_pandas()
    assert out.open_cents[0] == 300
    assert out.high_cents[0] == 900
    assert out.low_cents[0] == 100
    assert out.close_cents[0] == 100


def test_user_daily_twap(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_daily_twap
    # 23:00 value 2.00 (held 30min) ; 23:30 value 4.00 (held to midnight)
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "ts": pa.array([_ts("2024-01-01T23:00"), _ts("2024-01-01T23:30")],
                       pa.timestamp("us")),
        "user_id": pa.array([1, 1], pa.int64()),
        "event_type": pa.array(["x"] * 2),
        "value": pa.array([2.0, 4.0]),
    }), str(tmp_path / "events.parquet"))
    out = user_daily_twap(str(tmp_path)).to_pandas()
    half_hour = 1_800_000_000
    assert out.dur_us[0] == 2 * half_hour
    assert out.twap_num[0] == 200 * half_hour + 400 * half_hour


def test_order_overlap_pairs(ray_session, tmp_path):
    from ctdray.pipelines.analytics import order_overlap_pairs_per_customer
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([7, 7, 7], pa.int64()),
        "o_orderdate": pa.array([_ts("2024-01-01"), _ts("2024-01-05"),
                                 _ts("2024-03-01")], pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        # spans: o1 [jan1, jan10]; o2 [jan5, jan7]; o3 [mar1, mar2]
        "l_orderkey": pa.array([1, 2, 3], pa.int64()),
        "l_shipdate": pa.array([_ts("2024-01-10"), _ts("2024-01-07"),
                                _ts("2024-03-02")], pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = order_overlap_pairs_per_customer(str(tmp_path)).to_pandas()
    assert out.n_orders[0] == 3
    assert out.n_overlap_pairs[0] == 1     # o1 x o2 only


def test_supplier_borda_top10(ray_session, tmp_path):
    from ctdray.pipelines.analytics import supplier_borda_top10
    # s1: revenue 300, parts {1}, s2: revenue 100, parts {1,2}
    pq.write_table(pa.table({
        "l_suppkey": pa.array([1, 2, 2], pa.int64()),
        "l_partkey": pa.array([1, 1, 2], pa.int64()),
        "l_extendedprice": pa.array([300.0, 50.0, 50.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = supplier_borda_top10(str(tmp_path)).to_pandas() \
        .set_index("l_suppkey")
    # both have borda 3 (1+2 and 2+1) -> tie broken by suppkey
    assert list(out.index) == [1, 2]
    assert out.loc[1].rank_revenue == 1
    assert out.loc[1].rank_parts == 2
    assert out.loc[2].borda == 3

"""Batch 48: session conversion, daily revenue interpolation, rate
limiter, per-order first-ship lag."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_session_conversion_ppm(ray_session, tmp_path):
    from ctdray.pipelines.analytics import session_conversion_ppm
    # u1 session A: view+purchase (converted); session B (2h later):
    # view only.  u2: purchase only session.
    pq.write_table(pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "ts": pa.array([_ts("2024-01-01T00:00"), _ts("2024-01-01T00:10"),
                        _ts("2024-01-01T03:00"),
                        _ts("2024-01-01T00:00"), _ts("2024-01-02T00:00")],
                       pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "event_type": pa.array(["view", "purchase", "view",
                                "purchase", "purchase"]),
        "value": pa.array([0.0] * 5),
    }), str(tmp_path / "events.parquet"))
    out = session_conversion_ppm(str(tmp_path)).to_pandas()
    assert out.n_sessions[0] == 4
    assert out.n_view_sessions[0] == 2
    assert out.n_converted[0] == 1
    assert out.conversion_ppm[0] == 500_000


def test_daily_revenue_interpolated(ray_session, tmp_path):
    from ctdray.pipelines.analytics import daily_revenue_interpolated
    # days 1 and 4 known (100.00, 400.00); days 2,3 interpolated
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([1, 1], pa.int64()),
        "o_orderstatus": pa.array(["O", "O"]),
        "o_totalprice": pa.array([100.0, 400.0]),
        "o_orderdate": pa.array([_ts("2024-01-01"), _ts("2024-01-04")],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 2),
    }), str(tmp_path / "orders.parquet"))
    out = daily_revenue_interpolated(str(tmp_path)).to_pandas() \
        .sort_values("day").reset_index(drop=True)
    assert list(out.revenue_cents) == [10000, 20000, 30000, 40000]
    assert list(out.interpolated) == [0, 1, 1, 0]


def test_events_rate_limited(ray_session, tmp_path):
    from ctdray.pipelines.analytics import events_rate_limited
    # 4 events same user same minute -> keep first 2 by (ts, event_id);
    # 1 event next minute -> kept
    pq.write_table(pa.table({
        "event_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
        "ts": pa.array([_ts("2024-01-01T00:00:01"),
                        _ts("2024-01-01T00:00:02"),
                        _ts("2024-01-01T00:00:03"),
                        _ts("2024-01-01T00:00:04"),
                        _ts("2024-01-01T00:01:30")], pa.timestamp("us")),
        "user_id": pa.array([1] * 5, pa.int64()),
        "event_type": pa.array(["x"] * 5),
        "value": pa.array([0.0] * 5),
    }), str(tmp_path / "events.parquet"))
    out = events_rate_limited(str(tmp_path)).to_pandas()
    assert sorted(out.event_id) == [10, 11, 14]


def test_order_first_ship_lag_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import order_first_ship_lag_hist
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array([_ts("2024-01-01"), _ts("2024-01-01")],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        # order 1 ships on day 3 then day 9 -> first lag 2;
        # order 2 ships on day 3 -> lag 2
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_shipdate": pa.array([_ts("2024-01-03"), _ts("2024-01-09"),
                                _ts("2024-01-03")], pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = order_first_ship_lag_hist(str(tmp_path)).to_pandas()
    assert list(out.lag_days) == [2]
    assert list(out.n_orders) == [2]

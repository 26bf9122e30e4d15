"""Batch 79: FD violations, worst 5-day window, snapshot staleness,
premium SKUs."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_price_fd_violations(ray_session, tmp_path):
    from ctdray.pipelines.analytics import price_fd_violations
    pq.write_table(pa.table({
        "p_partkey": pa.array(range(4), pa.int64()),
        # (B1,1) -> two prices (violation); (B1,2) -> one; (B2,1) one
        "p_brand": pa.array(["B1", "B1", "B1", "B2"]),
        "p_size": pa.array([1, 1, 2, 1], pa.int32()),
        "p_retailprice": pa.array([10.0, 12.0, 10.0, 10.0]),
    }), str(tmp_path / "part.parquet"))
    out = price_fd_violations(str(tmp_path)).to_pandas()
    assert out.n_groups[0] == 3
    assert out.n_violating[0] == 1


def test_worst_5day_window(ray_session, tmp_path):
    from ctdray.pipelines.analytics import worst_5day_window
    # 10 days: 100 on days 1-5, nothing days 6-9, 50 on day 10
    # -> worst window starts day 6 (sum 50)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(6), pa.int64()),
        "o_orderdate": pa.array(
            [_ts(f"2024-01-0{i}") for i in range(1, 6)]
            + [_ts("2024-01-10")], pa.timestamp("us")),
        "o_totalprice": pa.array([100.0] * 5 + [50.0]),
    }), str(tmp_path / "orders.parquet"))
    out = worst_5day_window(str(tmp_path)).to_pandas()
    assert out.start_day[0] == np.datetime64("2024-01-06", "us")
    assert out.window_cents[0] == 5000


def test_snapshot_staleness_by_type(ray_session, tmp_path):
    from ctdray.pipelines.analytics import snapshot_staleness_by_type
    # event at 23:00 -> lag 1h; event at 00:00 -> lag 24h
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "ts": pa.array([_ts("2024-01-01T23:00"), _ts("2024-01-02T00:00")],
                       pa.timestamp("us")),
        "user_id": pa.array([1, 1], pa.int64()),
        "event_type": pa.array(["a", "a"]),
        "value": pa.array([0.0] * 2),
    }), str(tmp_path / "events.parquet"))
    out = snapshot_staleness_by_type(str(tmp_path)).to_pandas()
    hour = 3_600_000_000
    assert out.total_lag_us[0] == hour + 24 * hour
    assert out.max_lag_us[0] == 24 * hour


def test_premium_sku_counts(ray_session, tmp_path):
    from ctdray.pipelines.analytics import premium_sku_counts
    # B1 prices (cents): 100..1000; p90 = sorted[(10-1)*9//10=8] = 900
    # -> premium = prices > 900 -> one part (1000)
    pq.write_table(pa.table({
        "p_partkey": pa.array(range(10), pa.int64()),
        "p_brand": pa.array(["B1"] * 10),
        "p_retailprice": pa.array([(i + 1) * 1.0 for i in range(10)]),
    }), str(tmp_path / "part.parquet"))
    out = premium_sku_counts(str(tmp_path)).to_pandas()
    assert out.n_parts[0] == 10
    assert out.p90_cents[0] == 900
    assert out.n_premium[0] == 1

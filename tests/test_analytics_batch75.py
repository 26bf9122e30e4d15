"""Batch 75: JSON cov, same-day repeats, repdigit audit, 2-of-3
alerts."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_props_k_value_cov(ray_session, tmp_path):
    from ctdray.pipelines.analytics import props_k_value_cov
    # k = 1, 3 ; v cents = 100, 300 -> cov = 2*(100+900) - 4*400 = 400
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "ts": pa.array([_ts("2024-01-01")] * 2, pa.timestamp("us")),
        "user_id": pa.array([1, 1], pa.int64()),
        "event_type": pa.array(["a", "a"]),
        "value": pa.array([1.0, 3.0]),
        "props": pa.array(['{"k": 1}', '{"k": 3}']),
    }), str(tmp_path / "events.parquet"))
    out = props_k_value_cov(str(tmp_path)).to_pandas()
    assert out.n[0] == 2
    assert out.cov_num[0] == 400.0


def test_same_day_repeat_buyers(ray_session, tmp_path):
    from ctdray.pipelines.analytics import same_day_repeat_buyers
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(5), pa.int64()),
        # cust 1: two orders same day + one later day; cust 2: spread
        "o_custkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "o_orderdate": pa.array([_ts("1996-01-01"), _ts("1996-01-01"),
                                 _ts("1996-02-01"), _ts("1996-01-01"),
                                 _ts("1996-01-02")], pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    out = same_day_repeat_buyers(str(tmp_path)).to_pandas()
    assert out.n_repeat_customer_days[0] == 1
    assert out.n_repeat_customers[0] == 1


def test_repdigit_value_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import repdigit_value_audit
    # cents: 777 (repdigit), 123 (no), 1111 (repdigit)
    pq.write_table(pa.table({
        "event_id": pa.array(range(3), pa.int64()),
        "ts": pa.array([_ts("2024-01-01")] * 3, pa.timestamp("us")),
        "user_id": pa.array([1] * 3, pa.int64()),
        "event_type": pa.array(["a"] * 3),
        "value": pa.array([7.77, 1.23, 11.11]),
    }), str(tmp_path / "events.parquet"))
    out = repdigit_value_audit(str(tmp_path)).to_pandas()
    assert out.n_events[0] == 3
    assert out.n_repdigit[0] == 2


def test_alert_2of3_low_days(ray_session, tmp_path):
    from ctdray.pipelines.analytics import alert_2of3_low_days
    # daily: 10, 10, 100, 100 -> mean 55; low = d1, d2.
    # alerts: d2 (d1+d2 low), d3 (d1+d2 low in window)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(4), pa.int64()),
        "o_orderdate": pa.array(
            [_ts(f"2024-01-0{i}") for i in range(1, 5)],
            pa.timestamp("us")),
        "o_totalprice": pa.array([10.0, 10.0, 100.0, 100.0]),
    }), str(tmp_path / "orders.parquet"))
    out = alert_2of3_low_days(str(tmp_path)).to_pandas()
    assert out.n_days[0] == 4
    assert out.n_low_days[0] == 2
    assert out.n_alert_days[0] == 2

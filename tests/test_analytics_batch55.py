"""Batch 55: YoY comparable cohort, co-burst hours, sigma outliers,
row-offset funnel."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_same_customer_yoy_delta(ray_session, tmp_path):
    from ctdray.pipelines.analytics import same_customer_yoy_delta
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(4), pa.int64()),
        "o_custkey": pa.array([1, 1, 2, 3], pa.int64()),
        "o_orderdate": pa.array([_ts("1996-05-01"), _ts("1997-05-01"),
                                 _ts("1996-05-01"), _ts("1997-05-01")],
                                pa.timestamp("us")),
        # cust 1 in both years; cust 2 only 1996; cust 3 only 1997
        "o_totalprice": pa.array([100.0, 130.0, 50.0, 70.0]),
    }), str(tmp_path / "orders.parquet"))
    out = same_customer_yoy_delta(str(tmp_path)).to_pandas()
    assert list(out.o_custkey) == [1]
    assert out.cents_a[0] == 10000
    assert out.delta_cents[0] == 3000


def test_type_coburst_hours(ray_session, tmp_path):
    from ctdray.pipelines.analytics import type_coburst_hours
    # 3 hours; a counts [3,1,0], b counts [2,0,1]
    # medians (lower): a=1, b=1 -> above: a hr0 only, b hr0 only -> 1
    rows = [("a", "2024-01-01T00")] * 3 + [("a", "2024-01-01T01")] \
        + [("b", "2024-01-01T00")] * 2 + [("b", "2024-01-01T02")]
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_ts(h + ":05") for _, h in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array([t for t, _ in rows]),
        "value": pa.array([0.0] * len(rows)),
    }), str(tmp_path / "events.parquet"))
    out = type_coburst_hours(str(tmp_path)).to_pandas()
    assert list(out.type_a) == ["a"]
    assert list(out.n_coburst_hours) == [1]


def test_revenue_sigma_outlier_days(ray_session, tmp_path):
    from ctdray.pipelines.analytics import revenue_sigma_outlier_days
    # 9 days of 100 and one 2000 -> z of the spike = 3.0 > 2
    # (with n<6 no single point can exceed 2 sigma: max z = (n-1)/sqrt(n))
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(10), pa.int64()),
        "o_orderdate": pa.array(
            [_ts(f"2024-01-{i:02d}") for i in range(1, 11)],
            pa.timestamp("us")),
        "o_totalprice": pa.array([100.0] * 9 + [2000.0]),
    }), str(tmp_path / "orders.parquet"))
    out = revenue_sigma_outlier_days(str(tmp_path)).to_pandas() \
        .sort_values("day").reset_index(drop=True)
    assert list(out.is_outlier) == [0] * 9 + [1]


def test_view_purchase_within3(ray_session, tmp_path):
    from ctdray.pipelines.analytics import view_purchase_within3_events
    # stream: view, click, click, click, purchase  -> view NOT converted
    # then:  view, purchase                        -> converted
    types = ["view", "click", "click", "click", "purchase",
             "view", "purchase"]
    pq.write_table(pa.table({
        "event_id": pa.array(range(7), pa.int64()),
        "ts": pa.array([_ts(f"2024-01-01T0{i}:00") for i in range(7)],
                       pa.timestamp("us")),
        "user_id": pa.array([1] * 7, pa.int64()),
        "event_type": pa.array(types),
        "value": pa.array([0.0] * 7),
    }), str(tmp_path / "events.parquet"))
    out = view_purchase_within3_events(str(tmp_path)).to_pandas()
    assert out.n_views[0] == 2
    assert out.n_converted_views[0] == 1

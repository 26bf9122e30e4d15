"""Batch 21: fulfillment-lag histogram, top-value share, HHI
concentration, activity bitmask."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_lag_histogram_weekly(ray_session, tmp_path):
    from ctdray.pipelines.analytics import fulfillment_lag_histogram
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array([_ts("1995-01-01")] * 2,
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        # lags 3, 6 (week 0), 10 (week 1)
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_shipdate": pa.array([_ts("1995-01-04"), _ts("1995-01-07"),
                                _ts("1995-01-11")], pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = fulfillment_lag_histogram(str(tmp_path)).to_pandas() \
        .set_index("bucket_week").sort_index()
    assert list(out.n_lines) == [2, 1]
    assert list(out.min_lag_days) == [3, 10]
    assert list(out.max_lag_days) == [6, 10]


def test_top_value_share(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_top_value_share
    pq.write_table(pa.table({
        "event_id": pa.array([0, 1, 2], pa.int64()),
        "ts": pa.array([_ts("2024-01-01")] * 3, pa.timestamp("us")),
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "event_type": pa.array(["x"] * 3),
        "value": pa.array([1.0, 3.0, 5.0]),
    }), str(tmp_path / "events.parquet"))
    out = user_top_value_share(str(tmp_path)).to_pandas() \
        .set_index("user_id").sort_index()
    assert list(out.total_cents) == [400, 500]
    assert list(out.top_share_ppm) == [750_000, 1_000_000]


def test_hhi_two_suppliers(ray_session, tmp_path):
    from ctdray.pipelines.analytics import nation_supplier_hhi
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_nationkey": pa.array([0, 0], pa.int64()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0], pa.int64()),
        "n_name": pa.array(["N"]),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        # supplier 1: 75%, supplier 2: 25%
        "l_suppkey": pa.array([1, 2], pa.int64()),
        "l_extendedprice": pa.array([3.0, 1.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = nation_supplier_hhi(str(tmp_path)).to_pandas()
    assert out.n_suppliers[0] == 2
    assert out.hhi_ppm2[0] == 750_000 ** 2 + 250_000 ** 2


def test_activity_bitmask(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_activity_bitmask
    pq.write_table(pa.table({
        "event_id": pa.array([0, 1, 2, 3], pa.int64()),
        "ts": pa.array([_ts("2024-01-01T05:00"), _ts("2024-01-01T09:00"),
                        _ts("2024-01-03T00:00"), _ts("2023-12-31T00:00")],
                       pa.timestamp("us")),
        "user_id": pa.array([7, 7, 7, 7], pa.int64()),
        "event_type": pa.array(["x"] * 4),
        "value": pa.array([0.0] * 4),
    }), str(tmp_path / "events.parquet"))
    out = user_activity_bitmask(str(tmp_path)).to_pandas()
    # days 0 and 2 set; pre-anchor event dropped
    assert out["mask"][0] == (1 << 0) + (1 << 2)
    assert out.n_days[0] == 2

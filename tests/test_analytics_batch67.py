"""Batch 67: multiscale variance, rapid share, streaks, grid
sparsity."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_revenue_multiscale_variance(ray_session, tmp_path):
    from ctdray.pipelines.analytics import revenue_multiscale_variance
    # two days in the SAME week: day-grain has variance, week none
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array([_ts("2024-01-02"), _ts("2024-01-03")],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([10.0, 30.0]),
    }), str(tmp_path / "orders.parquet"))
    out = revenue_multiscale_variance(str(tmp_path)).to_pandas() \
        .set_index("grain")
    # day: n=2, x={1000,3000} -> 2*(1e6+9e6) - 16e6 = 4e6
    # (var_num is an exact decimal string to avoid >2^53 float rounding)
    assert int(out.loc["day"].var_num) == 4_000_000
    assert out.loc["week"].n_buckets == 1
    assert int(out.loc["week"].var_num) == 0
    assert int(out.loc["month"].var_num) == 0


def test_rapid_event_share(ray_session, tmp_path):
    from ctdray.pipelines.analytics import rapid_event_share
    # gaps: 30s (rapid), 3600s (not)
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([_ts("2024-01-01T00:00:00"),
                        _ts("2024-01-01T00:00:30"),
                        _ts("2024-01-01T01:00:30")], pa.timestamp("us")),
        "user_id": pa.array([1] * 3, pa.int64()),
        "event_type": pa.array(["x"] * 3),
        "value": pa.array([1.0, 2.0, 4.0]),
    }), str(tmp_path / "events.parquet"))
    out = rapid_event_share(str(tmp_path)).to_pandas()
    assert out.n_events[0] == 3
    assert out.n_rapid[0] == 1
    assert out.rapid_cents[0] == 200
    assert out.total_cents[0] == 700


def test_revenue_up_down_streaks(ray_session, tmp_path):
    from ctdray.pipelines.analytics import revenue_up_down_streaks
    # daily: 10, 20, 30, 5 -> up streak 2 (d1->d2->d3), down 1
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(4), pa.int64()),
        "o_orderdate": pa.array(
            [_ts(f"2024-01-0{i}") for i in range(1, 5)],
            pa.timestamp("us")),
        "o_totalprice": pa.array([10.0, 20.0, 30.0, 5.0]),
    }), str(tmp_path / "orders.parquet"))
    out = revenue_up_down_streaks(str(tmp_path)).to_pandas()
    assert out.longest_up_days[0] == 2
    assert out.longest_down_days[0] == 1
    assert out.n_days[0] == 4


def test_brand_size_grid_sparsity(ray_session, tmp_path):
    from ctdray.pipelines.analytics import brand_size_grid_sparsity
    pq.write_table(pa.table({
        "p_partkey": pa.array(range(3), pa.int64()),
        # brands {B1,B2} x sizes {1,2} = 4 possible, 3 occupied
        "p_brand": pa.array(["B1", "B1", "B2"]),
        "p_size": pa.array([1, 2, 1], pa.int32()),
    }), str(tmp_path / "part.parquet"))
    out = brand_size_grid_sparsity(str(tmp_path)).to_pandas()
    assert out.n_occupied[0] == 3
    assert out.occupancy_ppm[0] == 750_000

"""Batch 34: second-event distribution, longest increasing run,
seasonality index, embedding dim ranges."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def _events(tmp_path, users, types, values, times):
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(users)), pa.int64()),
        "ts": pa.array([_ts(t) for t in times], pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(types),
        "value": pa.array(values),
    }), str(tmp_path / "events.parquet"))


def test_second_event(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_second_event_type_dist
    _events(tmp_path,
            users=[1, 1, 1, 2, 2, 3],
            types=["view", "cart", "buy", "view", "buy", "view"],
            values=[0.0] * 6,
            times=["2024-01-01T00:00", "2024-01-01T01:00",
                   "2024-01-01T02:00", "2024-01-01T00:00",
                   "2024-01-01T01:00", "2024-01-01T00:00"])
    out = user_second_event_type_dist(str(tmp_path)).to_pandas()
    got = dict(zip(out.event_type, out.n_users))
    # u1 second = cart, u2 second = buy, u3 has no second
    assert got == {"cart": 1, "buy": 1}


def test_longest_increasing(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_longest_increasing_run
    _events(tmp_path,
            users=[1] * 6,
            types=["x"] * 6,
            # 1,2,3 (run 3), 2 (break), 5, 5 (equal breaks)
            values=[1.0, 2.0, 3.0, 2.0, 5.0, 5.0],
            times=[f"2024-01-01T0{i}:00" for i in range(6)])
    out = user_longest_increasing_run(str(tmp_path)).to_pandas()
    assert out.longest_run[0] == 3 and out.n_events[0] == 6


def test_seasonality(ray_session, tmp_path):
    from ctdray.pipelines.analytics import order_seasonality_index
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(3), pa.int64()),
        "o_orderdate": pa.array([_ts("1995-01-05"), _ts("1995-01-20"),
                                 _ts("1996-02-05")],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([1.0, 2.0, 1.0]),
    }), str(tmp_path / "orders.parquet"))
    out = order_seasonality_index(str(tmp_path)).to_pandas()
    assert list(out.month_of_year) == [1, 2]
    assert list(out.revenue_cents) == [300, 100]
    assert list(out.seasonality_ppm) == [9_000_000, 3_000_000]


def test_dim_ranges(ray_session, tmp_path):
    from ctdray.pipelines.analytics import embedding_dim_range
    pq.write_table(pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[1.0, -2.0], [0.5, 3.0]],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 0], pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))
    out = embedding_dim_range(str(tmp_path)).to_pandas() \
        .set_index("dim").sort_index()
    assert list(out.min_e4) == [5_000, -20_000]
    assert list(out.max_e4) == [10_000, 30_000]

"""Batch 42: top value jumps, minute histogram, weekend-ratio
buckets."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_value_jumps(ray_session, tmp_path):
    from ctdray.pipelines.analytics import top_order_value_jumps
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "o_custkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "o_orderdate": pa.array(
            [_ts("1995-01-01"), _ts("1995-02-01"), _ts("1995-03-01"),
             _ts("1995-01-01"), _ts("1995-02-01")],
            pa.timestamp("us")),
        # cust1: 10 -> 50 (jump 40) -> 20; cust2: 30 -> 10 (no jump)
        "o_totalprice": pa.array([10.0, 50.0, 20.0, 30.0, 10.0]),
    }), str(tmp_path / "orders.parquet"))
    out = top_order_value_jumps(str(tmp_path)).to_pandas()
    assert list(out.o_custkey) == [1]
    assert list(out.jump_cents) == [4000]


def test_minute_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import event_minute_hist
    pq.write_table(pa.table({
        "event_id": pa.array(range(3), pa.int64()),
        "ts": pa.array([_ts("2024-01-01T00:05:10"),
                        _ts("2024-01-01T01:05:59"),
                        _ts("2024-01-01T02:30:00")],
                       pa.timestamp("us")),
        "user_id": pa.array([0] * 3, pa.int64()),
        "event_type": pa.array(["x"] * 3),
        "value": pa.array([0.0] * 3),
    }), str(tmp_path / "events.parquet"))
    out = event_minute_hist(str(tmp_path)).to_pandas()
    got = dict(zip(out.minute, out.n))
    assert got == {5: 2, 30: 1}


def test_weekend_ratio_buckets(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_weekend_ratio_hist
    # 2024-01-06 Saturday, 2024-01-08 Monday
    pq.write_table(pa.table({
        "event_id": pa.array(range(4), pa.int64()),
        "ts": pa.array([_ts("2024-01-06T01:00"), _ts("2024-01-08T01:00"),
                        _ts("2024-01-08T02:00"),
                        _ts("2024-01-06T03:00")], pa.timestamp("us")),
        # u1: 1 weekend of 2 -> 500000 ppm -> bucket 5
        # u2: 1 weekend of 2 -> bucket 5
        "user_id": pa.array([1, 1, 2, 2], pa.int64()),
        "event_type": pa.array(["x"] * 4),
        "value": pa.array([0.0] * 4),
    }), str(tmp_path / "events.parquet"))
    out = user_weekend_ratio_hist(str(tmp_path)).to_pandas()
    got = dict(zip(out.ratio_bucket, out.n_users))
    assert got == {5: 2}

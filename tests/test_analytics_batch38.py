"""Batch 38: above-brand-mean counts, weekly stickiness, exclusive
parts, share volatility."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_above_brand_mean(ray_session, tmp_path):
    from ctdray.pipelines.analytics import parts_above_brand_mean
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_brand": pa.array(["B", "B", "B"]),
        # mean = 2.00; only 3.00 is strictly above
        "p_retailprice": pa.array([1.0, 2.0, 3.0]),
    }), str(tmp_path / "part.parquet"))
    out = parts_above_brand_mean(str(tmp_path)).to_pandas()
    assert (out.n_above[0], out.n_total[0]) == (1, 3)


def test_stickiness(ray_session, tmp_path):
    from ctdray.pipelines.analytics import weekly_stickiness_ppm
    # week of 2024-01-01 (a Monday): u1 active 2 days, u2 active 1 day
    pq.write_table(pa.table({
        "event_id": pa.array(range(4), pa.int64()),
        "ts": pa.array([_ts("2024-01-01T01:00"), _ts("2024-01-02T01:00"),
                        _ts("2024-01-02T02:00"),
                        _ts("2024-01-03T01:00")], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "event_type": pa.array(["x"] * 4),
        "value": pa.array([0.0] * 4),
    }), str(tmp_path / "events.parquet"))
    out = weekly_stickiness_ppm(str(tmp_path)).to_pandas()
    assert len(out) == 1
    # sum_dau = 3 (u1 two days + u2 one), wau = 2, n_days = 3
    assert (out.sum_dau[0], out.wau[0], out.n_days[0]) == (3, 2, 3)
    assert out.stickiness_ppm[0] == (1_000_000 * 3) // 6


def test_exclusive_parts(ray_session, tmp_path):
    from ctdray.pipelines.analytics import supplier_exclusive_parts
    pq.write_table(pa.table({
        # part 1 only supp 10; part 2 supp 10+11; part 3 only supp 11
        "l_partkey": pa.array([1, 2, 2, 3, 1], pa.int64()),
        "l_suppkey": pa.array([10, 10, 11, 11, 10], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = supplier_exclusive_parts(str(tmp_path)).to_pandas() \
        .set_index("l_suppkey").sort_index()
    assert dict(out.n_exclusive_parts) == {10: 1, 11: 1}


def test_share_volatility(ray_session, tmp_path):
    from ctdray.pipelines.analytics import event_type_share_volatility
    pq.write_table(pa.table({
        "event_id": pa.array(range(4), pa.int64()),
        # day1: a,a (a=100%); day2: a,b (a=50%, b=50%)
        "ts": pa.array([_ts("2024-01-01T01:00"), _ts("2024-01-01T02:00"),
                        _ts("2024-01-02T01:00"),
                        _ts("2024-01-02T02:00")], pa.timestamp("us")),
        "user_id": pa.array([0] * 4, pa.int64()),
        "event_type": pa.array(["a", "a", "a", "b"]),
        "value": pa.array([0.0] * 4),
    }), str(tmp_path / "events.parquet"))
    out = event_type_share_volatility(str(tmp_path)).to_pandas() \
        .set_index("event_type")
    assert out.loc["a"].min_share_ppm == 500_000
    assert out.loc["a"].max_share_ppm == 1_000_000
    assert out.loc["a"].share_range_ppm == 500_000
    assert out.loc["b"].share_range_ppm == 0

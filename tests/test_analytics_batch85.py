"""Batch 85: brand activation, value granularity, session sizes,
intra-order dup parts."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_brand_activation_rate(ray_session, tmp_path):
    from ctdray.pipelines.analytics import brand_activation_rate
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_brand": pa.array(["B1", "B1", "B2"]),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = brand_activation_rate(str(tmp_path)).to_pandas() \
        .set_index("p_brand")
    assert out.loc["B1"].n_active == 1
    assert out.loc["B1"].activation_ppm == 500_000
    assert out.loc["B2"].activation_ppm == 0


def test_value_granularity_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import value_granularity_audit
    # cents: 100, 100, 200 -> 2 distinct over span 101 -> 19801 ppm
    pq.write_table(pa.table({
        "event_id": pa.array(range(3), pa.int64()),
        "value": pa.array([1.0, 1.0, 2.0]),
    }), str(tmp_path / "events.parquet"))
    out = value_granularity_audit(str(tmp_path)).to_pandas()
    assert out.n_distinct_cents[0] == 2
    assert out.min_cents[0] == 100 and out.max_cents[0] == 200
    assert out.coverage_ppm[0] == (1_000_000 * 2) // 101


def test_session_size_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import session_size_hist
    # session of 2 events, then (2h later) session of 1
    pq.write_table(pa.table({
        "event_id": pa.array(range(3), pa.int64()),
        "ts": pa.array([_ts("2024-01-01T00:00"), _ts("2024-01-01T00:10"),
                        _ts("2024-01-01T03:00")], pa.timestamp("us")),
        "user_id": pa.array([1] * 3, pa.int64()),
        "event_type": pa.array(["x"] * 3),
        "value": pa.array([0.0] * 3),
    }), str(tmp_path / "events.parquet"))
    out = session_size_hist(str(tmp_path)).to_pandas() \
        .set_index("session_events").sort_index()
    assert out.loc[1].n_sessions == 1
    assert out.loc[2].n_sessions == 1


def test_order_dup_part_lines(ray_session, tmp_path):
    from ctdray.pipelines.analytics import order_dup_part_lines
    pq.write_table(pa.table({
        # order 1 lists part 5 on THREE lines; order 2 clean
        "l_orderkey": pa.array([1, 1, 1, 2], pa.int64()),
        "l_partkey": pa.array([5, 5, 5, 9], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = order_dup_part_lines(str(tmp_path)).to_pandas()
    assert out.n_dup_pairs[0] == 1
    assert out.n_extra_lines[0] == 2
    assert out.n_orders_affected[0] == 1

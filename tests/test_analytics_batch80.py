"""Batch 80: nested medians, frequent triples, temporal Spearman,
outage audit."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_nation_median_of_customer_medians(ray_session, tmp_path):
    from ctdray.pipelines.analytics import (
        nation_median_of_customer_medians)
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_nationkey": pa.array([0, 0, 0], pa.int32()),
    }), str(tmp_path / "customer.parquet"))
    # cust medians: 100 (of 100), 300 (of 200,300,400 -> 300), 900
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(5), pa.int64()),
        "o_custkey": pa.array([1, 2, 2, 2, 3], pa.int64()),
        "o_totalprice": pa.array([100.0, 200.0, 300.0, 400.0, 900.0]),
    }), str(tmp_path / "orders.parquet"))
    out = nation_median_of_customer_medians(str(tmp_path)).to_pandas()
    assert out.median_of_medians_cents[0] == 30000
    assert out.n_customers[0] == 3


def test_frequent_part_triples(ray_session, tmp_path):
    from ctdray.pipelines.analytics import frequent_part_triples
    # orders 1 and 2 both contain {1,2,3}; order 3 has {1,2,9} once
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 1, 2, 2, 2, 3, 3, 3], pa.int64()),
        "l_partkey": pa.array([1, 2, 3, 3, 1, 2, 1, 2, 9], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = frequent_part_triples(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert (out.part_a[0], out.part_b[0], out.part_c[0]) == (1, 2, 3)
    assert out.n_orders[0] == 2


def test_user_value_temporal_spearman(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_value_temporal_spearman
    # u1: before 100, after 900 ; u2: before 900, after 100 -> ranks
    # flip -> d2 = 1 + 1 = 2 ; u3 only before (excluded)
    rows = [(1, "2024-01-05", 1.0), (1, "2024-01-25", 9.0),
            (2, "2024-01-05", 9.0), (2, "2024-01-25", 1.0),
            (3, "2024-01-05", 5.0)]
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_ts(d + "T00:00") for _, d, _v in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([u for u, _, _v in rows], pa.int64()),
        "event_type": pa.array(["x"] * len(rows)),
        "value": pa.array([v for _, _, v in rows]),
    }), str(tmp_path / "events.parquet"))
    out = user_value_temporal_spearman(str(tmp_path)).to_pandas()
    assert out.n_users[0] == 2
    assert out.sum_d2[0] == 2


def test_stream_outage_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import stream_outage_audit
    # active minutes 0, 1, then 120 -> silent gap of 118 minutes
    pq.write_table(pa.table({
        "event_id": pa.array(range(3), pa.int64()),
        "ts": pa.array([_ts("2024-01-01T00:00"), _ts("2024-01-01T00:01"),
                        _ts("2024-01-01T02:00")], pa.timestamp("us")),
        "user_id": pa.array([1] * 3, pa.int64()),
        "event_type": pa.array(["x"] * 3),
        "value": pa.array([0.0] * 3),
    }), str(tmp_path / "events.parquet"))
    out = stream_outage_audit(str(tmp_path)).to_pandas()
    assert out.n_active_minutes[0] == 3
    assert out.n_outages[0] == 1
    assert out.longest_gap_minutes[0] == 118

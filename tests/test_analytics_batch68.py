"""Batch 68: transition timing, hierarchy shares, month-end share,
staleness histogram."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_transition_time_matrix(ray_session, tmp_path):
    from ctdray.pipelines.analytics import transition_time_matrix
    # a->b gaps: 10s and 30s -> lower median 10s
    pq.write_table(pa.table({
        "event_id": pa.array(range(4), pa.int64()),
        "ts": pa.array([_ts("2024-01-01T00:00:00"),
                        _ts("2024-01-01T00:00:10"),
                        _ts("2024-01-01T01:00:00"),
                        _ts("2024-01-01T01:00:30")], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 2, 2], pa.int64()),
        "event_type": pa.array(["a", "b", "a", "b"]),
        "value": pa.array([0.0] * 4),
    }), str(tmp_path / "events.parquet"))
    out = transition_time_matrix(str(tmp_path)).to_pandas() \
        .set_index("pair")
    assert out.loc["a>b"].value == 10_000_000.0


def test_hierarchy_share_report(ray_session, tmp_path):
    from ctdray.pipelines.analytics import hierarchy_share_report
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0], pa.int32()),
        "r_name": pa.array(["R0"])}), str(tmp_path / "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_name": pa.array(["N0", "N1"]),
        "n_regionkey": pa.array([0, 0], pa.int32()),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_nationkey": pa.array([0, 1], pa.int32()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([1, 2], pa.int64()),
        "o_totalprice": pa.array([25.0, 75.0]),
    }), str(tmp_path / "orders.parquet"))
    out = hierarchy_share_report(str(tmp_path)).to_pandas() \
        .set_index(["level", "key"])
    assert out.loc[("nation", "N0")].share_of_parent_ppm == 250_000
    assert out.loc[("nation", "N1")].share_of_parent_ppm == 750_000
    assert out.loc[("region", "R0")].share_of_parent_ppm == 1_000_000


def test_month_end_revenue_share(ray_session, tmp_path):
    from ctdray.pipelines.analytics import month_end_revenue_share
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(3), pa.int64()),
        # Jan 30 & 31 are month-end (days 29-31); Jan 10 is not
        "o_orderdate": pa.array([_ts("1996-01-30"), _ts("1996-01-31"),
                                 _ts("1996-01-10")], pa.timestamp("us")),
        "o_totalprice": pa.array([10.0, 20.0, 70.0]),
    }), str(tmp_path / "orders.parquet"))
    out = month_end_revenue_share(str(tmp_path)).to_pandas()
    assert out.end_cents[0] == 3000
    assert out.total_cents[0] == 10000
    assert out.month_end_ppm[0] == 300_000


def test_user_staleness_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_staleness_hist
    # user 1 last on day 3 (stale 0); users 2,3 last on day 1 (stale 2)
    rows = [(1, "2024-01-01"), (1, "2024-01-03"),
            (2, "2024-01-01"), (3, "2024-01-01")]
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_ts(d + "T04:00") for _, d in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "event_type": pa.array(["x"] * len(rows)),
        "value": pa.array([0.0] * len(rows)),
    }), str(tmp_path / "events.parquet"))
    out = user_staleness_hist(str(tmp_path)).to_pandas() \
        .set_index("days_stale")
    assert out.loc[0].n_users == 1
    assert out.loc[2].n_users == 2

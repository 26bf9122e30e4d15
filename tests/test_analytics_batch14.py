"""Multi-grain time rollup, Pareto cutoff, weekday×hour share matrix,
and session market-basket pairs — tiny hand-built inputs pin the exact
semantics the DuckDB oracles verify at driver scale."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_time_rollup_multigrain_levels_and_week_start(ray_session,
                                                      tmp_path):
    from ctdray.pipelines.analytics import time_rollup_multigrain
    pq.write_table(pa.table({
        # 1995-01-01 was a Sunday; 1995-01-02 a Monday (new ISO week)
        "ts": pa.array([_ts("1995-01-01T10:15:00"),
                        _ts("1995-01-01T10:45:00"),
                        _ts("1995-01-01T23:00:00"),
                        _ts("1995-01-02T00:30:00")], pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 4.0, 8.0]),
    }), str(tmp_path / "events.parquet"))
    out = time_rollup_multigrain(str(tmp_path)).to_pandas()
    got = {(g, str(b)): (n, c) for g, b, n, c in zip(
        out.granularity, out.bucket, out.n_events, out.value_cents)}
    assert got[("hour", "1995-01-01 10:00:00")] == (2, 300)
    assert got[("day", "1995-01-01 00:00:00")] == (3, 700)
    assert got[("day", "1995-01-02 00:00:00")] == (1, 800)
    # Sunday 1995-01-01 belongs to the week starting Monday 1994-12-26
    assert got[("week", "1994-12-26 00:00:00")] == (3, 700)
    assert got[("week", "1995-01-02 00:00:00")] == (1, 800)
    assert len(got) == 3 + 2 + 2


def test_pareto_customer_cutoff_crossing(ray_session, tmp_path):
    from ctdray.pipelines.analytics import pareto_customer_cutoff
    pq.write_table(pa.table({
        # per-cust revenue: c1=50.00, c2=30.00, c3=20.00 (total 100.00)
        # 80% = 8000 cents: c1 (5000) no, +c2 (8000) -> crossed at k=2
        "o_custkey": pa.array([1, 1, 2, 3], pa.int64()),
        "o_totalprice": pa.array([20.0, 30.0, 30.0, 20.0]),
    }), str(tmp_path / "orders.parquet"))
    out = pareto_customer_cutoff(str(tmp_path)).to_pandas()
    assert list(out.n_customers) == [2]
    assert list(out.cum_cents) == [8000]
    assert list(out.total_cents) == [10000]


def test_events_dow_hour_share_isodow_and_ppm(ray_session, tmp_path):
    from ctdray.pipelines.analytics import events_dow_hour_share
    pq.write_table(pa.table({
        # 1995-01-02 was a Monday (isodow 1); 3 events: 2@10h, 1@11h
        "ts": pa.array([_ts("1995-01-02T10:00:00"),
                        _ts("1995-01-02T10:59:00"),
                        _ts("1995-01-02T11:00:00"),
                        _ts("1995-01-08T05:00:00")],  # Sunday isodow 7
                       pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = events_dow_hour_share(str(tmp_path)).to_pandas()
    got = {(d, h): (n, s) for d, h, n, s in zip(
        out.isodow, out.hour, out.n_events, out.share_ppm)}
    assert got[(1, 10)] == (2, 666666)
    assert got[(1, 11)] == (1, 333333)
    assert got[(7, 5)] == (1, 1000000)


def test_session_type_pairs_gap_and_distinct(ray_session, tmp_path):
    from ctdray.pipelines.analytics import session_type_pairs
    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        # u1 session A: view,click,view (pair view-click once, distinct)
        # u1 session B (after >30min gap): view only -> no pairs
        # u2: click,?? single event -> no pairs
        "ts": pa.array([_ts("1995-01-01T10:00:00"),
                        _ts("1995-01-01T10:10:00"),
                        _ts("1995-01-01T10:20:00"),
                        _ts("1995-01-01T11:00:01"),
                        _ts("1995-01-01T10:00:00")], pa.timestamp("us")),
        "event_type": pa.array(["view", "click", "view", "view", "click"]),
    }), str(tmp_path / "events.parquet"))
    out = session_type_pairs(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert (out.type_a[0], out.type_b[0], out.n_sessions[0]) == \
        ("click", "view", 1)


def test_session_type_pairs_counts_sessions_not_events(ray_session,
                                                       tmp_path):
    from ctdray.pipelines.analytics import session_type_pairs
    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        # two sessions, both containing the a/b pair -> n_sessions == 2
        "ts": pa.array([_ts("1995-01-01T10:00:00"),
                        _ts("1995-01-01T10:01:00"),
                        _ts("1995-01-01T12:00:00"),
                        _ts("1995-01-01T12:01:00")], pa.timestamp("us")),
        "event_type": pa.array(["a", "b", "b", "a"]),
    }), str(tmp_path / "events.parquet"))
    out = session_type_pairs(str(tmp_path)).to_pandas()
    assert (out.type_a[0], out.type_b[0], out.n_sessions[0]) == ("a", "b", 2)

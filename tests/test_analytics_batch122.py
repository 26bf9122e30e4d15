"""Batch 122: edge churn by year, deletion vectors, quiet window,
mix changepoint."""
import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_coorder_edge_churn_by_year(ray_session, tmp_path):
    from ctdray.pipelines.analytics import coorder_edge_churn_by_year
    # 1995 edges {1-2, 2-3}; 1996 edges {1-2} -> common 1
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2, 3, 3], pa.int64()),
        "l_partkey": pa.array([1, 2, 2, 3, 1, 2], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderdate": pa.array([_ts("1995-03-01"), _ts("1995-06-01"),
                                 _ts("1996-02-01")],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    out = coorder_edge_churn_by_year(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(1995, 1996, 1, 2, 1)]


def _deleted(u):
    return int(hashlib.md5(str(u).encode()).hexdigest()[:2],
               16) % 16 == 0


def test_deletion_vector_plan(ray_session, tmp_path):
    from ctdray.pipelines.analytics import deletion_vector_plan
    udel = next(u for u in range(1000) if _deleted(u))
    ukeep = next(u for u in range(1000) if not _deleted(u))
    # chunk 0: 2 rows, 1 deleted -> 50% -> bucket 10;
    # chunk 1: 1 row kept -> bucket 0
    pq.write_table(pa.table({
        "event_id": pa.array([0, 1, 32], pa.int64()),
        "user_id": pa.array([udel, ukeep, ukeep], pa.int64()),
    }), str(tmp_path / "events.parquet"))
    out = deletion_vector_plan(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(0, 1), (10, 1)]


def test_type_quiet_window(ray_session, tmp_path):
    from ctdray.pipelines.analytics import type_quiet_window
    # type a at minutes 0 and 60 -> gaps 60 and 1380; type b at one
    # minute -> 1440
    pq.write_table(pa.table({
        "event_type": pa.array(["a", "a", "b"]),
        "ts": pa.array([_ts("2024-01-01T00:00:00"),
                        _ts("2024-01-01T01:00:00"),
                        _ts("2024-01-01T05:30:00")],
                       pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = type_quiet_window(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        ("a", 2, 1380), ("b", 1, 1440)]


def test_type_mix_changepoint(ray_session, tmp_path):
    from ctdray.pipelines.analytics import type_mix_changepoint
    # union day grid = {day1, day3} (day2 has no events at all).
    # type a counts [3, 0] -> only split after day1: dev |3*1-0*1|=3;
    # type b counts [0, 3] -> dev 3, same split day
    days = ["2024-01-01", "2024-01-02", "2024-01-03"]
    pq.write_table(pa.table({
        "event_type": pa.array(["a"] * 3 + ["b"] * 3),
        "ts": pa.array([_ts(f"{days[0]}T0{i}:00:00")
                        for i in range(3)]
                       + [_ts(f"{days[2]}T0{i}:00:00")
                          for i in range(3)],
                       pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = type_mix_changepoint(str(tmp_path)).to_pandas() \
        .set_index("event_type")
    assert out.loc["a"].best_day.day == 1
    assert out.loc["a"].deviation == "3"
    assert out.loc["b"].best_day.day == 1
    assert out.loc["b"].deviation == "3"

"""Batch 49: watermark lateness, daily type dominance, table checksum,
cross-entity band matches."""
import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_user_late_events(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_late_events
    # event_id order: ts 10:00, 10:05, 10:03 -> third trails the
    # running max (10:05) by 2 min > 60s watermark -> 1 late
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([_ts("2024-01-01T10:00"), _ts("2024-01-01T10:05"),
                        _ts("2024-01-01T10:03")], pa.timestamp("us")),
        "user_id": pa.array([7, 7, 7], pa.int64()),
        "event_type": pa.array(["x"] * 3),
        "value": pa.array([0.0] * 3),
    }), str(tmp_path / "events.parquet"))
    out = user_late_events(str(tmp_path)).to_pandas()
    assert out.n_late[0] == 1
    assert out.n_events[0] == 3


def test_event_type_daily_dominance(ray_session, tmp_path):
    from ctdray.pipelines.analytics import event_type_daily_dominance
    # day1: a=2 b=1 ; day2: a=1 b=1 -> a wins 1 day, b wins 0
    pq.write_table(pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "ts": pa.array([_ts("2024-01-01T01:00")] * 3
                       + [_ts("2024-01-02T01:00")] * 2,
                       pa.timestamp("us")),
        "user_id": pa.array([1] * 5, pa.int64()),
        "event_type": pa.array(["a", "a", "b", "a", "b"]),
        "value": pa.array([0.0] * 5),
    }), str(tmp_path / "events.parquet"))
    out = event_type_daily_dominance(str(tmp_path)).to_pandas() \
        .set_index(["type_a", "type_b"])
    assert out.loc[("a", "b")].n_days_a_wins == 1
    assert out.loc[("b", "a")].n_days_a_wins == 0


def test_lineitem_table_checksum(ray_session, tmp_path):
    from ctdray.pipelines.analytics import lineitem_table_checksum
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2], pa.int64()),
        "l_linenumber": pa.array([1, 1], pa.int32()),
        "l_quantity": pa.array([5.0, 7.5]),
    }), str(tmp_path / "lineitem.parquet"))
    out = lineitem_table_checksum(str(tmp_path)).to_pandas()
    expect = 0
    for s in ("1|1|500", "2|1|750"):
        expect ^= int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    assert out.checksum[0] == expect
    assert out.n_rows[0] == 2


def test_cust_supp_balance_matches(ray_session, tmp_path):
    from ctdray.pipelines.analytics import cust_supp_balance_matches
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_nationkey": pa.array([0, 0, 1], pa.int32()),
        "c_acctbal": pa.array([100.0, 120.0, 500.0]),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([10, 11], pa.int64()),
        "s_nationkey": pa.array([0, 1], pa.int32()),
        # nation 0: supplier 105.00 matches customer 100.00 (±10) but
        # not 120.00; nation 1: supplier 900.00 matches nothing
        "s_acctbal": pa.array([105.0, 900.0]),
    }), str(tmp_path / "supplier.parquet"))
    out = cust_supp_balance_matches(str(tmp_path)).to_pandas()
    assert list(out.nationkey) == [0]
    assert list(out.n_pairs) == [1]

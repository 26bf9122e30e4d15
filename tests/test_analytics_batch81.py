"""Batch 81: hazard table, calibration lift, unattributed purchases,
DOW-mix divergence."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_purchase_hazard_table(ray_session, tmp_path):
    from ctdray.pipelines.analytics import purchase_hazard_table
    # user 1 purchases on days 1, 2, 5 -> gaps 1 day and 3 days
    rows = ["2024-01-01", "2024-01-02", "2024-01-05"]
    pq.write_table(pa.table({
        "event_id": pa.array(range(3), pa.int64()),
        "ts": pa.array([_ts(d + "T10:00") for d in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([1] * 3, pa.int64()),
        "event_type": pa.array(["purchase"] * 3),
        "value": pa.array([0.0] * 3),
    }), str(tmp_path / "events.parquet"))
    out = purchase_hazard_table(str(tmp_path)).to_pandas() \
        .set_index("k_days")
    assert out.loc[1].n_at_risk == 2      # both gaps >= 0 days
    assert out.loc[2].n_events == 1       # the 1-day gap converts at k=2
    assert out.loc[4].n_events == 1       # the 3-day gap at k=4
    assert out.n_gaps_total.iloc[0] == 2


def test_score_calibration_lift(ray_session, tmp_path):
    from ctdray.pipelines.analytics import score_calibration_lift
    # u1 score 900, future 500; u2 score 100, future 100
    rows = [(1, "2024-01-05", 9.0), (1, "2024-01-25", 5.0),
            (2, "2024-01-05", 1.0), (2, "2024-01-25", 1.0)]
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_ts(d + "T00:00") for _, d, _v in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([u for u, _, _v in rows], pa.int64()),
        "event_type": pa.array(["x"] * len(rows)),
        "value": pa.array([v for _, _, v in rows]),
    }), str(tmp_path / "events.parquet"))
    out = score_calibration_lift(str(tmp_path)).to_pandas() \
        .set_index("decile").sort_index()
    assert out.loc[0].future_cents == 100    # low scorer
    assert out.loc[5].future_cents == 500    # high scorer


def test_unattributed_purchase_share(ray_session, tmp_path):
    from ctdray.pipelines.analytics import unattributed_purchase_share
    # purchase 1: view 1h before (attributed); purchase 2: nothing
    # in prior 24h (unattributed)
    rows = [("view", "2024-01-01T09:00"), ("purchase", "2024-01-01T10:00"),
            ("purchase", "2024-01-05T10:00")]
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_ts(t) for _, t in rows], pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array([t for t, _ in rows]),
        "value": pa.array([0.0] * len(rows)),
    }), str(tmp_path / "events.parquet"))
    out = unattributed_purchase_share(str(tmp_path)).to_pandas()
    assert out.n_purchases[0] == 2
    assert out.n_unattributed[0] == 1
    assert out.unattributed_ppm[0] == 500_000


def test_nation_dow_mix_l1(ray_session, tmp_path):
    from ctdray.pipelines.analytics import nation_dow_mix_l1
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_nationkey": pa.array([0, 1], pa.int32()),
    }), str(tmp_path / "customer.parquet"))
    # nation 0 orders Mon only; nation 1 orders Tue only
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(2), pa.int64()),
        "o_custkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array([_ts("2024-01-01"), _ts("2024-01-02")],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    out = nation_dow_mix_l1(str(tmp_path)).to_pandas() \
        .set_index("nationkey")
    # nation0 grid row [1,0,...]; global [1,1,0...]; tg=2, tn=1
    # l1 = |1*2-1*1| + |0*2-1*1| = 2
    assert out.loc[0].l1_num == 2.0
    assert out.loc[1].l1_num == 2.0

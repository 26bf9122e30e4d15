"""Batch 60: peak 3h window, lag cross-correlation, floor-mean ANOVA,
integer EWMA scan."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_daily_peak_3h_window(ray_session, tmp_path):
    from ctdray.pipelines.analytics import daily_peak_3h_window
    # hours: 1 (x1), 2 (x2), 3 (x1), 10 (x1) -> best window starts at 1
    hours = [1, 2, 2, 3, 10]
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(hours)), pa.int64()),
        "ts": pa.array([_ts(f"2024-01-01T{h:02d}:00") for h in hours],
                       pa.timestamp("us")),
        "user_id": pa.array([1] * len(hours), pa.int64()),
        "event_type": pa.array(["x"] * len(hours)),
        "value": pa.array([0.0] * len(hours)),
    }), str(tmp_path / "events.parquet"))
    out = daily_peak_3h_window(str(tmp_path)).to_pandas()
    assert out.start_hour[0] == 1
    assert out.window_events[0] == 4


def test_type_pair_lag_xcorr(ray_session, tmp_path):
    from ctdray.pipelines.analytics import type_pair_lag_xcorr
    # views: day0 x2 ; purchases: day1 x3
    rows = [("view", "2024-01-01")] * 2 + [("purchase", "2024-01-02")] * 3
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_ts(d + "T01:00") for _, d in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array([t for t, _ in rows]),
        "value": pa.array([0.0] * len(rows)),
    }), str(tmp_path / "events.parquet"))
    out = type_pair_lag_xcorr(str(tmp_path)).to_pandas() \
        .set_index("lag")
    # NB: .dot is a pandas method name — index with brackets
    assert out.loc[0, "dot"] == 0
    assert out.loc[1, "dot"] == 6     # 2 views x 3 purchases next day
    assert out.loc[2, "dot"] == 0


def test_brand_revenue_anova(ray_session, tmp_path):
    from ctdray.pipelines.analytics import brand_revenue_anova
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_brand": pa.array(["B1", "B2"]),
    }), str(tmp_path / "part.parquet"))
    # B1: 10, 10 ; B2: 30, 30 -> gm=20, SSB = 2*100+2*100 = 400,
    # SST = (100+100+900+900) - 2*20*80 + 4*400 = 2000-3200+1600 = 400
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 2, 2], pa.int64()),
        "l_extendedprice": pa.array([10.0, 10.0, 30.0, 30.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = brand_revenue_anova(str(tmp_path)).to_pandas()
    assert out.n_rows[0] == 4
    assert out.n_brands[0] == 2
    assert out.ssb_ppm[0] == 1_000_000   # all variance between groups


def test_user_value_ewma2(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_value_ewma2
    # cents: 100, 200, 50 -> e1 = 50, e2 = (200+50)//2 = 125,
    # e3 = (50+125)//2 = 87
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([_ts(f"2024-01-01T0{i}:00") for i in range(3)],
                       pa.timestamp("us")),
        "user_id": pa.array([1] * 3, pa.int64()),
        "event_type": pa.array(["x"] * 3),
        "value": pa.array([1.0, 2.0, 0.5]),
    }), str(tmp_path / "events.parquet"))
    out = user_value_ewma2(str(tmp_path)).to_pandas()
    assert out.ewma_cents[0] == 87
    assert out.n_events[0] == 3

"""Batch 102: prior-views covariance, brand/size rollup, error
recovery histogram, linenumber profile."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_purchase_priorviews_cov(ray_session, tmp_path):
    from ctdray.pipelines.analytics import purchase_priorviews_cov
    # user 1: views 10:00, 10:20; purchases at 10:10 (x=1, y=500)
    # and 10:30 (x=2, y=1000).  n=2, sx=3, sy=1500, sxy=2500
    # cov_num = 2*2500 - 3*1500 = 500
    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "event_type": pa.array(["view", "purchase", "view",
                                "purchase"]),
        "ts": pa.array([_ts("2024-01-01T10:00:00"),
                        _ts("2024-01-01T10:10:00"),
                        _ts("2024-01-01T10:20:00"),
                        _ts("2024-01-01T10:30:00")],
                       pa.timestamp("us")),
        "value": pa.array([0.0, 5.0, 0.0, 10.0]),
    }), str(tmp_path / "events.parquet"))
    out = purchase_priorviews_cov(str(tmp_path)).to_pandas()
    assert out.n_purchases[0] == 2
    assert out.cov_num[0] == "500"


def test_brand_size_rollup(ray_session, tmp_path):
    from ctdray.pipelines.analytics import brand_size_rollup
    pq.write_table(pa.table({
        "p_brand": pa.array(["A", "A", "B"]),
        "p_size": pa.array([1, 2, 1], pa.int64()),
        "p_retailprice": pa.array([10.0, 20.0, 5.0]),
    }), str(tmp_path / "part.parquet"))
    out = brand_size_rollup(str(tmp_path)).to_pandas()
    lvl1 = out[out.lvl == 1].set_index("p_brand")
    assert lvl1.loc["A"].n_parts == 2
    assert lvl1.loc["A"].retail_cents == 3000
    assert (lvl1.p_size == -1).all()
    lvl2 = out[out.lvl == 2]
    assert len(lvl2) == 3
    row = lvl2[(lvl2.p_brand == "A") & (lvl2.p_size == 2)].iloc[0]
    assert row.retail_cents == 2000


def test_error_recovery_minutes_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import error_recovery_minutes_hist
    # user 1: error 10:00 -> next ok 10:03 (3 min); duplicate error
    # at 10:00 collapses; error 11:00 never recovers -> dropped
    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "event_type": pa.array(["error", "error", "click", "error"]),
        "ts": pa.array([_ts("2024-01-01T10:00:00"),
                        _ts("2024-01-01T10:00:00"),
                        _ts("2024-01-01T10:03:00"),
                        _ts("2024-01-01T11:00:00")],
                       pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = error_recovery_minutes_hist(str(tmp_path)).to_pandas()
    assert out.recovery_minutes.tolist() == [3]
    assert out.n_errors.tolist() == [1]


def test_linenumber_quantity_profile(ray_session, tmp_path):
    from ctdray.pipelines.analytics import linenumber_quantity_profile
    pq.write_table(pa.table({
        "l_linenumber": pa.array([1, 1, 2], pa.int64()),
        "l_quantity": pa.array([10.0, 20.0, 5.0]),
        "l_extendedprice": pa.array([1.0, 2.0, 0.5]),
    }), str(tmp_path / "lineitem.parquet"))
    out = linenumber_quantity_profile(str(tmp_path)).to_pandas() \
        .set_index("l_linenumber")
    assert out.loc[1].n_lines == 2
    assert out.loc[1].qty_sum == 30
    assert out.loc[1].price_cents == 300
    assert out.loc[2].qty_sum == 5

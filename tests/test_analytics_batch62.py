"""Batch 62: change-point, 4-4-5 calendar, sampled top-k fidelity,
decayed value."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_revenue_changepoint_day(ray_session, tmp_path):
    from ctdray.pipelines.analytics import revenue_changepoint_day
    # level shift after day 2: 100,100 then 900,900
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(4), pa.int64()),
        "o_orderdate": pa.array(
            [_ts("2024-01-01"), _ts("2024-01-02"),
             _ts("2024-01-03"), _ts("2024-01-04")], pa.timestamp("us")),
        "o_totalprice": pa.array([100.0, 100.0, 900.0, 900.0]),
    }), str(tmp_path / "orders.parquet"))
    out = revenue_changepoint_day(str(tmp_path)).to_pandas()
    assert out.split_day[0] == np.datetime64("2024-01-02", "us")
    assert out.n_days[0] == 4


def test_orders_fiscal_445(ray_session, tmp_path):
    from ctdray.pipelines.analytics import orders_fiscal_445_counts
    # 1994-12-26 = fy0 week0 -> period 1;
    # +4 weeks = 1995-01-23 -> week 4 -> period 2;
    # +52 weeks = 1995-12-25 -> fy1 period 1
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(3), pa.int64()),
        "o_orderdate": pa.array([_ts("1994-12-26"), _ts("1995-01-23"),
                                 _ts("1995-12-25")], pa.timestamp("us")),
        "o_totalprice": pa.array([10.0, 20.0, 30.0]),
    }), str(tmp_path / "orders.parquet"))
    out = orders_fiscal_445_counts(str(tmp_path)).to_pandas() \
        .set_index(["fiscal_year", "period"]).sort_index()
    assert out.loc[(0, 1)].cents == 1000
    assert out.loc[(0, 2)].cents == 2000
    assert out.loc[(1, 1)].cents == 3000


def test_sampled_topk_fidelity(ray_session, tmp_path):
    from ctdray.pipelines.analytics import sampled_topk_fidelity
    # doc 27 samples in (md5 prefix '0'); doc 1 does not.
    pq.write_table(pa.table({
        "doc_id": pa.array([27, 1], pa.int64()),
        "text": pa.array(["a a b", "a c c c"]),
    }), str(tmp_path / "documents.parquet"))
    out = sampled_topk_fidelity(str(tmp_path), k=2).to_pandas()
    # exact top2 by count: a(3), c(3) -> ties: a then b? counts: a=3,
    # c=3, b=1 -> top2 = {a, c}; sampled (doc 27 only): a=2, b=1 ->
    # top2 = {a, b} -> overlap 1, union 3
    assert out.n_overlap[0] == 1
    assert out.jaccard_ppm[0] == 333_333


def test_user_decayed_value(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_decayed_value
    # max day = jan 3. ages: 2, 1, 0 -> 400>>2=100, 400>>1=200, 400>>0
    pq.write_table(pa.table({
        "event_id": pa.array(range(3), pa.int64()),
        "ts": pa.array([_ts("2024-01-01"), _ts("2024-01-02"),
                        _ts("2024-01-03")], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "event_type": pa.array(["x"] * 3),
        "value": pa.array([4.0, 4.0, 4.0]),
    }), str(tmp_path / "events.parquet"))
    out = user_decayed_value(str(tmp_path)).to_pandas()
    assert out.decayed_cents[0] == 100 + 200 + 400
    assert out.n_events[0] == 3

"""Batch 101: Mann-Whitney 2U, brand discount subsidy, distributed
prefix-max lateness, acctbal sign mix."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_quantity_mannwhitney_u2(ray_session, tmp_path):
    from ctdray.pipelines.analytics import quantity_mannwhitney_u2
    # R: [1, 3, 3]; N: [2, 3]; other flags ignored
    # wins (R>N): 3>2, 3>2 -> 2 -> 4 doubled; ties (3==3): 2
    # 2U = 4 + 2 = 6
    pq.write_table(pa.table({
        "l_returnflag": pa.array(["R", "R", "R", "N", "N", "A"]),
        "l_quantity": pa.array([1.0, 3.0, 3.0, 2.0, 3.0, 50.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = quantity_mannwhitney_u2(str(tmp_path)).to_pandas()
    assert out.u2[0] == "6"
    assert out.n_a[0] == 3
    assert out.n_b[0] == 2


def test_brand_discount_subsidy_ppm(ray_session, tmp_path):
    from ctdray.pipelines.analytics import brand_discount_subsidy_ppm
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_brand": pa.array(["A", "B"]),
    }), str(tmp_path / "part.parquet"))
    # brand A: 100.00 at 10% + 100.00 at 0% -> subsidy 10.00 of
    # 200.00 gross -> 50000 ppm; brand B: 0%
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 2], pa.int64()),
        "l_extendedprice": pa.array([100.0, 100.0, 40.0]),
        "l_discount": pa.array([0.10, 0.0, 0.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = brand_discount_subsidy_ppm(str(tmp_path)).to_pandas()
    assert out.p_brand.tolist() == ["A", "B"]
    assert out.subsidy_ppm.tolist() == [50000, 0]


def test_event_arrival_lateness_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import event_arrival_lateness_hist
    # arrival order by id: 10:00, 10:05, 10:02 (3 min late), 10:10
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array([_ts("2024-01-01T10:00:00"),
                        _ts("2024-01-01T10:05:00"),
                        _ts("2024-01-01T10:02:00"),
                        _ts("2024-01-01T10:10:00")],
                       pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = event_arrival_lateness_hist(str(tmp_path)).to_pandas() \
        .set_index("lateness_minutes")
    assert out.loc[0].n_events == 3
    assert out.loc[3].n_events == 1


def test_event_arrival_lateness_crosses_chunks(ray_session, tmp_path):
    from ctdray.pipelines.analytics import event_arrival_lateness_hist
    # ids spread so the chunking splits them; the late event's
    # watermark comes from a PREVIOUS chunk's max (prefix seed)
    pq.write_table(pa.table({
        "event_id": pa.array([1, 5000, 9000], pa.int64()),
        "ts": pa.array([_ts("2024-01-01T10:30:00"),
                        _ts("2024-01-01T10:00:00"),
                        _ts("2024-01-01T10:29:00")],
                       pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = event_arrival_lateness_hist(str(tmp_path), n_chunks=4) \
        .to_pandas().set_index("lateness_minutes")
    assert out.loc[0].n_events == 1    # first event
    assert out.loc[30].n_events == 1   # 10:00 vs 10:30 watermark
    assert out.loc[1].n_events == 1    # 10:29 vs 10:30 watermark


def test_customer_acctbal_sign_by_segment(ray_session, tmp_path):
    from ctdray.pipelines.analytics import (
        customer_acctbal_sign_by_segment)
    pq.write_table(pa.table({
        "c_mktsegment": pa.array(["AUTO", "AUTO", "AUTO", "HOUSE"]),
        "c_acctbal": pa.array([-5.25, 0.0, 3.10, 7.77]),
    }), str(tmp_path / "customer.parquet"))
    out = customer_acctbal_sign_by_segment(str(tmp_path)).to_pandas()
    got = {(r.c_mktsegment, r.bal_sign): r.n_customers
           for r in out.itertuples()}
    assert got == {("AUTO", -1): 1, ("AUTO", 0): 1, ("AUTO", 1): 1,
                   ("HOUSE", 1): 1}

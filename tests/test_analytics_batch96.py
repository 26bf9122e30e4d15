"""Batch 96: Q6 parameter-grid sweep, orderkey-date sortedness audit,
grouped props.k quartiles, users active all weeks."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_q6_grid_sweep(ray_session, tmp_path):
    from ctdray.pipelines.analytics import q6_grid_sweep
    # line: qty 10, disc 5%, price 1.0 -> in all disc-5 bands, all caps
    # line: qty 40, disc 3%, price 2.0 -> only (3, 50)
    pq.write_table(pa.table({
        "l_quantity": pa.array([10.0, 40.0]),
        "l_discount": pa.array([0.05, 0.03]),
        "l_extendedprice": pa.array([1.0, 2.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = q6_grid_sweep(str(tmp_path)).to_pandas()
    rows = {(r.disc_pct, r.qty_cap): (r.n_lines, r.revenue_e4)
            for r in out.itertuples()}
    assert len(rows) == 9
    assert rows[(5, 24)] == (1, 500)       # 100c * 5
    assert rows[(3, 50)] == (1, 600)       # 200c * 3
    assert rows[(3, 24)] == (0, 0)
    assert rows[(7, 50)] == (0, 0)


def test_orderkey_date_sortedness(ray_session, tmp_path):
    from ctdray.pipelines.analytics import orderkey_date_sortedness
    # keys 1..4 (one bucket), dates go back once (key 3)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_orderdate": pa.array(
            [_ts("2024-01-01"), _ts("2024-01-05"), _ts("2024-01-03"),
             _ts("2024-01-07")], pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    out = orderkey_date_sortedness(str(tmp_path)).to_pandas()
    assert out.n_pairs[0] == 3
    assert out.n_inversions[0] == 1
    assert out.inversion_ppm[0] == 333_333


def test_props_k_quartiles_by_type(ray_session, tmp_path):
    from ctdray.pipelines.analytics import props_k_quartiles_by_type
    # type a: k = 1..4 -> p25=1, p50=2, p75=3 (quantile_disc)
    pq.write_table(pa.table({
        "event_id": pa.array(range(4), pa.int64()),
        "ts": pa.array([_ts("2024-01-01")] * 4, pa.timestamp("us")),
        "user_id": pa.array([1] * 4, pa.int64()),
        "event_type": pa.array(["a"] * 4),
        "value": pa.array([0.0] * 4),
        "props": pa.array(['{"k": 1}', '{"k": 2}', '{"k": 3}',
                           '{"k": 4}']),
    }), str(tmp_path / "events.parquet"))
    out = props_k_quartiles_by_type(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert (out.k_p25[0], out.k_p50[0], out.k_p75[0]) == (1, 2, 3)


def test_users_active_all_weeks(ray_session, tmp_path):
    from ctdray.pipelines.analytics import users_active_all_weeks
    # weeks of 2024-01-01 and 2024-01-08; user 1 in both, user 2 in one
    pq.write_table(pa.table({
        "event_id": pa.array(range(3), pa.int64()),
        "ts": pa.array([_ts("2024-01-02"), _ts("2024-01-09"),
                        _ts("2024-01-03")], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "event_type": pa.array(["a"] * 3),
        "value": pa.array([0.0] * 3),
    }), str(tmp_path / "events.parquet"))
    out = users_active_all_weeks(str(tmp_path)).to_pandas()
    assert out.n_weeks[0] == 2
    assert out.n_users_total[0] == 2
    assert out.n_users_full[0] == 1

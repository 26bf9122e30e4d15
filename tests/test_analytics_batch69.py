"""Batch 69: unit-price deviation, price gap hist, business hours,
habit consistency."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_unit_price_deviation_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import unit_price_deviation_hist
    pq.write_table(pa.table({
        "p_partkey": pa.array([1], pa.int64()),
        "p_retailprice": pa.array([10.0]),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        # expected = 1000*200//100 = 2000 cents.
        # line1 ext 22.00 -> dev +100000 ppm -> bucket 1
        # line2 ext 19.00 -> dev -50000 ppm -> floor bucket -1
        "l_partkey": pa.array([1, 1], pa.int64()),
        "l_quantity": pa.array([2.0, 2.0]),
        "l_extendedprice": pa.array([22.0, 19.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = unit_price_deviation_hist(str(tmp_path)).to_pandas() \
        .set_index("bucket").sort_index()
    assert out.loc[1].n_lines == 1
    assert out.loc[-1].n_lines == 1


def test_brand_price_gap_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import brand_price_gap_hist
    # B1 cents sorted: 100, 100, 104 -> gaps 0 (bucket -1), 4 (bucket 2)
    pq.write_table(pa.table({
        "p_partkey": pa.array(range(3), pa.int64()),
        "p_brand": pa.array(["B1"] * 3),
        "p_retailprice": pa.array([1.0, 1.0, 1.04]),
    }), str(tmp_path / "part.parquet"))
    out = brand_price_gap_hist(str(tmp_path)).to_pandas() \
        .set_index("bucket").sort_index()
    assert out.loc[-1].n_gaps == 1
    assert out.loc[2].n_gaps == 1


def test_users_business_hours_share(ray_session, tmp_path):
    from ctdray.pipelines.analytics import users_business_hours_share
    # user 1 modal hour 10 (business); user 2 modal hour 2 (not)
    rows = [(1, 10), (1, 10), (1, 22), (2, 2)]
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_ts(f"2024-01-01T{h:02d}:00") for _, h in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "event_type": pa.array(["x"] * len(rows)),
        "value": pa.array([0.0] * len(rows)),
    }), str(tmp_path / "events.parquet"))
    out = users_business_hours_share(str(tmp_path)).to_pandas()
    assert out.n_users[0] == 2
    assert out.n_business[0] == 1
    assert out.business_ppm[0] == 500_000


def test_priority_habit_consistency(ray_session, tmp_path):
    from ctdray.pipelines.analytics import priority_habit_consistency
    # cust 1: P1 P1 P2 -> modal P1 -> 2 of 3 match; cust 2: P3 -> 1/1
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(4), pa.int64()),
        "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
        "o_orderpriority": pa.array(["P1", "P1", "P2", "P3"]),
    }), str(tmp_path / "orders.parquet"))
    out = priority_habit_consistency(str(tmp_path)).to_pandas()
    assert out.n_orders[0] == 4
    assert out.n_matching[0] == 3
    assert out.consistency_ppm[0] == 750_000

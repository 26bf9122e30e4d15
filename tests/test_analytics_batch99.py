"""Batch 99: parts-ordered-all-years relational division, nearest-view
gap join, runner-up price gap, nation acctbal two-sided profile."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_parts_ordered_all_years(ray_session, tmp_path):
    from ctdray.pipelines.analytics import parts_ordered_all_years
    # years present: 2023, 2024.  part 1 ships both; part 2 only 2023.
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 2, 1], pa.int64()),
        "l_shipdate": pa.array([_ts("2023-05-01"), _ts("2024-01-02"),
                                _ts("2023-07-07"), _ts("2023-08-08")],
                               pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = parts_ordered_all_years(str(tmp_path)).to_pandas()
    assert out.p_partkey.tolist() == [1]


def test_purchase_nearest_view_gap_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import purchase_nearest_view_gap_hist
    # user 1: views at 10:00 and 10:10; purchase at 10:09 -> nearest
    # view is AFTER it (1 min), not the preceding one (9 min).
    # user 2: purchase with no views -> dropped.  duplicate purchase
    # timestamps collapse to one.
    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "event_type": pa.array(["view", "view", "purchase",
                                "purchase", "purchase"]),
        "ts": pa.array([_ts("2024-01-01T10:00:00"),
                        _ts("2024-01-01T10:10:00"),
                        _ts("2024-01-01T10:09:00"),
                        _ts("2024-01-01T10:09:00"),
                        _ts("2024-01-01T12:00:00")],
                       pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = purchase_nearest_view_gap_hist(str(tmp_path)).to_pandas()
    assert out.gap_minutes.tolist() == [1]
    assert out.n_purchases.tolist() == [1]


def test_part_price_runnerup_gap_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import part_price_runnerup_gap_hist
    # part 1: supplier offers min 100.00 and 250.00 -> gap 15000c
    #   (bucket 1); supplier 1's 300.00 line loses to its 100.00 line.
    # part 2: single supplier -> dropped.
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 1, 2], pa.int64()),
        "l_suppkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_extendedprice": pa.array([300.0, 100.0, 250.0, 50.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = part_price_runnerup_gap_hist(str(tmp_path)).to_pandas()
    assert out.gap_bucket.tolist() == [1]
    assert out.n_parts.tolist() == [1]


def test_nation_acctbal_profile(ray_session, tmp_path):
    from ctdray.pipelines.analytics import nation_acctbal_profile
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_name": pa.array(["ALGERIA", "BRAZIL"]),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "c_nationkey": pa.array([0, 0], pa.int64()),
        "c_acctbal": pa.array([10.50, -2.25]),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "s_nationkey": pa.array([1], pa.int64()),
        "s_acctbal": pa.array([99.99]),
    }), str(tmp_path / "supplier.parquet"))
    out = nation_acctbal_profile(str(tmp_path)).to_pandas()
    assert out.n_name.tolist() == ["ALGERIA", "BRAZIL"]
    # ALGERIA: customers only (1050 - 225 cents), no suppliers
    assert out.cust_sum_cents.tolist() == [825, 0]
    assert out.n_cust.tolist() == [2, 0]
    assert out.supp_sum_cents.tolist() == [0, 9999]
    assert out.n_supp.tolist() == [0, 1]

"""Customer order-gap median, day-over-day revenue delta, Q2-style
cheapest-supplier argmin, and Q10 returned-item revenue — tiny
hand-built inputs pin the exact semantics the DuckDB oracles verify at
driver scale."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_customer_order_gap_median_lower_median(ray_session, tmp_path):
    from ctdray.pipelines.analytics import customer_order_gap_median
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        # cust 1: days 0, 3, 10 -> gaps [3, 7], lower median 3
        # cust 2: single order -> no gaps -> excluded
        # cust 3: days 5, 5 (same day, tie on orderkey) -> gap [0]
        "o_custkey": pa.array([1, 1, 1, 2, 3], pa.int64()),
        "o_orderdate": pa.array(
            [_ts("1995-01-01"), _ts("1995-01-04"), _ts("1995-01-11"),
             _ts("1995-02-01"), _ts("1995-03-05")], pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    extra = pa.table({
        "o_orderkey": pa.array([6], pa.int64()),
        "o_custkey": pa.array([3], pa.int64()),
        "o_orderdate": pa.array([_ts("1995-03-05")], pa.timestamp("us")),
    })
    both = pa.concat_tables(
        [pq.read_table(str(tmp_path / "orders.parquet")), extra])
    pq.write_table(both, str(tmp_path / "orders.parquet"))
    out = customer_order_gap_median(str(tmp_path)).to_pandas() \
        .sort_values("o_custkey").reset_index(drop=True)
    assert list(out.o_custkey) == [1, 3]
    assert list(out.n_gaps) == [2, 1]
    assert list(out.median_gap_days) == [3, 0]


def test_daily_revenue_delta_ppm_truncation(ray_session, tmp_path):
    from ctdray.pipelines.analytics import daily_revenue_delta
    pq.write_table(pa.table({
        "o_orderdate": pa.array(
            [_ts("1995-01-01"), _ts("1995-01-02"), _ts("1995-01-02"),
             _ts("1995-01-03")], pa.timestamp("us")),
        "o_totalprice": pa.array([100.0, 20.0, 30.0, 75.0]),
    }), str(tmp_path / "orders.parquet"))
    out = daily_revenue_delta(str(tmp_path)).to_pandas()
    assert list(out.revenue_cents) == [10000, 5000, 7500]
    assert list(out.delta_cents) == [0, -5000, 2500]
    # day 2: -5000/10000 -> -500000 ppm; day 3: 2500/5000 -> +500000
    assert list(out.delta_ppm) == [0, -500000, 500000]


def test_daily_revenue_delta_ppm_sign_truncates_toward_zero(
        ray_session, tmp_path):
    from ctdray.pipelines.analytics import daily_revenue_delta
    # delta/prev = -1/3: toward-zero gives -333333 (floor would be -333334)
    pq.write_table(pa.table({
        "o_orderdate": pa.array(
            [_ts("1995-01-01"), _ts("1995-01-02")], pa.timestamp("us")),
        "o_totalprice": pa.array([0.03, 0.02]),
    }), str(tmp_path / "orders.parquet"))
    out = daily_revenue_delta(str(tmp_path)).to_pandas()
    assert list(out.delta_ppm) == [0, -333333]


def test_cheapest_supplier_per_part_argmin_and_ties(ray_session, tmp_path):
    from ctdray.pipelines.analytics import cheapest_supplier_per_part
    pq.write_table(pa.table({
        # part 1: supp 1 spends 100000 cp, supp 2 spends 90000 -> supp 2
        # part 2: supps 4 and 3 tie -> smaller suppkey 3
        "l_partkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "l_suppkey": pa.array([1, 2, 2, 4, 3], pa.int64()),
        "l_extendedprice": pa.array([10.0, 4.0, 5.0, 6.0, 6.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0, 0.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = cheapest_supplier_per_part(str(tmp_path)).to_pandas() \
        .sort_values("l_partkey").reset_index(drop=True)
    assert list(out.l_partkey) == [1, 2]
    assert list(out.best_suppkey) == [2, 3]
    assert list(out.spend_cp) == [90000, 60000]


def test_q10_returned_revenue_filter_join_topn(ray_session, tmp_path):
    from ctdray.pipelines.analytics import q10_returned_revenue
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_name": pa.array(["alice", "bob", "carol"]),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 12], pa.int64()),
        "o_custkey": pa.array([1, 2, 1], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        # cust 1 returned: 10.00 (order 10) + 5.00@10% (order 12)
        # cust 2 returned: 20.00; cust 3 never appears; N flag excluded
        "l_orderkey": pa.array([10, 10, 11, 12], pa.int64()),
        "l_returnflag": pa.array(["R", "N", "R", "R"]),
        "l_extendedprice": pa.array([10.0, 99.0, 20.0, 5.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.10]),
    }), str(tmp_path / "lineitem.parquet"))
    out = q10_returned_revenue(str(tmp_path), n=2).to_pandas()
    # cust 2: 20.00 -> 200000 cp; cust 1: 100000 + 500*90 = 145000 cp
    assert list(out.o_custkey) == [2, 1]
    assert list(out.revenue_cp) == [200000, 145000]
    assert list(out.c_name) == ["bob", "alice"]

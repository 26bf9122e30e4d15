"""Batch 90: adapted TPC-H Q4 (late-order EXISTS) and Q22 (sales
opportunity), supplier customer-concentration histogram, daily-count
autocorrelation."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_q4_late_order_share(ray_session, tmp_path):
    from ctdray.pipelines.analytics import q4_late_order_share
    # order 1 (in Q1, URGENT): lags 5 and 70 -> late
    # order 2 (in Q1, LOW): lag 10 -> not late
    # order 3 (outside window): excluded
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderdate": pa.array([_ts("1995-02-01"), _ts("1995-03-01"),
                                 _ts("1996-02-01")], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "5-LOW", "1-URGENT"]),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_shipdate": pa.array([_ts("1995-02-06"), _ts("1995-04-12"),
                                _ts("1995-03-11"), _ts("1996-06-01")],
                               pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = q4_late_order_share(str(tmp_path)).to_pandas() \
        .set_index("o_orderpriority")
    assert out.loc["1-URGENT"].n_late_orders == 1
    assert out.loc["5-LOW"].n_late_orders == 0


def test_q22_sales_opportunity(ray_session, tmp_path):
    from ctdray.pipelines.analytics import q22_sales_opportunity
    # positive balances: 300, 400, 100 -> mean ~266 (cust 1 negative,
    # excluded from the mean).  cust 2 (300) and cust 4 (400) are
    # above avg; cust 4 ordered AFTER the cutoff -> excluded, cust 2
    # only BEFORE the cutoff -> lapsed, counted.  cust 3 not above.
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_nationkey": pa.array([0, 1, 2, 2], pa.int32()),
        "c_acctbal": pa.array([-1.0, 3.0, 1.0, 4.0]),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([2, 4], pa.int64()),
        "o_orderdate": pa.array([_ts("1999-06-01"), _ts("2000-06-01")],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    out = q22_sales_opportunity(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert out.c_nationkey[0] == 1
    assert out.n_custs[0] == 1
    assert out.total_cents[0] == 300


def test_supplier_customer_concentration_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import (
        supplier_customer_concentration_hist)
    # supp 1: cust 1 -> 300c, cust 2 -> 100c: top share 750000 -> dec 7
    # supp 2: cust 1 only -> share 1000000 -> dec 10
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([1, 2], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_suppkey": pa.array([1, 2, 1], pa.int64()),
        "l_extendedprice": pa.array([3.0, 5.0, 1.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = supplier_customer_concentration_hist(str(tmp_path)) \
        .to_pandas().set_index("share_decile")
    assert out.loc[7].n_suppliers == 1
    assert out.loc[10].n_suppliers == 1


def test_daily_count_autocorr(ray_session, tmp_path):
    from ctdray.pipelines.analytics import daily_count_autocorr
    # days 1..3 with counts 1, 2, 3
    # lag 1: pairs (d2,d1)=(2,1), (d3,d2)=(3,2): n'=2,
    #   num = 2*(2*1+3*2) - (2+3)*(1+2) = 16 - 15 = 1
    ts = ([_ts("2024-01-01T00:00")] + [_ts("2024-01-02T00:00")] * 2
          + [_ts("2024-01-03T00:00")] * 3)
    pq.write_table(pa.table({
        "event_id": pa.array(range(6), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1] * 6, pa.int64()),
        "event_type": pa.array(["a"] * 6),
        "value": pa.array([0.0] * 6),
    }), str(tmp_path / "events.parquet"))
    out = daily_count_autocorr(str(tmp_path)).to_pandas() \
        .set_index("lag_days")
    assert out.loc[1].n_pairs == 2
    assert out.loc[1].corr_num == "1"
    assert out.loc[7].n_pairs == 0
    assert out.loc[7].corr_num == "0"

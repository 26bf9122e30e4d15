"""Batch 97: daily whale-share histogram, single-supplier order audit,
customer tenure histogram, lapsed-customers window sweep."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_daily_whale_share_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import daily_whale_share_hist
    # day 1: orders 300c + 100c -> whale share 750000 -> decile 7
    # day 2: single order -> share 1000000 -> decile 10
    pq.write_table(pa.table({
        "o_orderdate": pa.array([_ts("2024-01-01"), _ts("2024-01-01"),
                                 _ts("2024-01-02")], pa.timestamp("us")),
        "o_totalprice": pa.array([3.0, 1.0, 5.0]),
    }), str(tmp_path / "orders.parquet"))
    out = daily_whale_share_hist(str(tmp_path)).to_pandas() \
        .set_index("share_decile")
    assert out.loc[7].n_days == 1
    assert out.loc[10].n_days == 1


def test_single_supplier_order_ppm(ray_session, tmp_path):
    from ctdray.pipelines.analytics import single_supplier_order_ppm
    # order 1: supp {1,1} -> single; order 2: supp {1,2} -> not;
    # order 3: one line -> excluded
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "l_suppkey": pa.array([1, 1, 1, 2, 9], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = single_supplier_order_ppm(str(tmp_path)).to_pandas()
    assert out.n_multi[0] == 2
    assert out.n_single_supplier[0] == 1
    assert out.single_ppm[0] == 500_000


def test_customer_tenure_years_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import customer_tenure_years_hist
    # cust 1: 1995 -> 1997 = 2 years; cust 2: 1996 only = 0 years
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
        "o_orderdate": pa.array([_ts("1995-06-01"), _ts("1997-02-01"),
                                 _ts("1996-01-01")], pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    out = customer_tenure_years_hist(str(tmp_path)).to_pandas() \
        .set_index("tenure_years")
    assert out.loc[0].n_customers == 1
    assert out.loc[2].n_customers == 1


def test_lapsed_customers_sweep(ray_session, tmp_path):
    from ctdray.pipelines.analytics import lapsed_customers_sweep
    # asof 2001-08-01: cust 1 last 2001-07-15 (17d, never lapsed);
    # cust 2 last 2001-03-01 (153d: lapsed at 30/90, not 180/365)
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 2, 2], pa.int64()),
        "o_orderdate": pa.array([_ts("2001-07-15"), _ts("2001-03-01"),
                                 _ts("2000-01-01")], pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    out = lapsed_customers_sweep(str(tmp_path)).to_pandas() \
        .set_index("window_days")
    assert list(out.n_total) == [2, 2, 2, 2]
    assert out.loc[30].n_lapsed == 1
    assert out.loc[90].n_lapsed == 1
    assert out.loc[180].n_lapsed == 0
    assert out.loc[365].n_lapsed == 0

"""Batch 78: monthly p90 tracking, intermittent parts, top-2 gap."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_monthly_value_p90(ray_session, tmp_path):
    from ctdray.pipelines.analytics import monthly_value_p90
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(3), pa.int64()),
        "o_orderdate": pa.array([_ts("1996-01-05"), _ts("1996-01-20"),
                                 _ts("1996-02-01")], pa.timestamp("us")),
        "o_totalprice": pa.array([10.0, 90.0, 50.0]),
    }), str(tmp_path / "orders.parquet"))
    out = monthly_value_p90(str(tmp_path)).to_pandas() \
        .set_index("month")
    # jan values {1000, 9000}: quantile_disc 0.9 -> index
    # floor(1*0.9)=0 -> 1000? No: (n-1)*q = 0.9 -> floor 0 ->
    # sorted[0]=1000... DuckDB quantile_disc(0.9) of 2 values
    assert out.loc["1996-02"].value == 5000.0
    assert out.loc["1996-01"].value in (1000.0, 9000.0)


def test_intermittent_parts(ray_session, tmp_path):
    from ctdray.pipelines.analytics import intermittent_parts
    # part 1 sold 1995, 1997 (gap 1996); part 2 sold 1995 only
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 2], pa.int64()),
        "l_shipdate": pa.array([_ts("1995-06-01"), _ts("1997-06-01"),
                                _ts("1995-06-01")], pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = intermittent_parts(str(tmp_path)).to_pandas()
    assert out.n_intermittent_parts[0] == 1
    assert out.n_gap_years[0] == 1


def test_customer_top2_gap_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import customer_top2_gap_hist
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(5), pa.int64()),
        # cust 1: 100.00 vs 99.96 -> gap 4 cents -> bucket 2
        # cust 2: tie 50/50 -> gap 0 -> bucket -1 ; cust 3 single: skip
        "o_custkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "o_totalprice": pa.array([100.0, 99.96, 50.0, 50.0, 10.0]),
    }), str(tmp_path / "orders.parquet"))
    out = customer_top2_gap_hist(str(tmp_path)).to_pandas() \
        .set_index("bucket").sort_index()
    assert out.loc[2].n_customers == 1
    assert out.loc[-1].n_customers == 1
    assert out.n_customers.sum() == 2

"""Batch 61: growth accounting waterfall, Hamilton allocation,
quality-by-length calibration."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_revenue_growth_accounting(ray_session, tmp_path):
    from ctdray.pipelines.analytics import revenue_growth_accounting
    # cust 1: 1996=100, 1997=130 (expansion 30)
    # cust 2: 1996=50 only       (churned into 1997)
    # cust 3: 1997=70 only       (new in 1997)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(4), pa.int64()),
        "o_custkey": pa.array([1, 1, 2, 3], pa.int64()),
        "o_orderdate": pa.array([_ts("1996-02-01"), _ts("1997-02-01"),
                                 _ts("1996-02-01"), _ts("1997-02-01")],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([100.0, 130.0, 50.0, 70.0]),
    }), str(tmp_path / "orders.parquet"))
    out = revenue_growth_accounting(str(tmp_path)).to_pandas() \
        .set_index("year").sort_index()
    assert out.loc[1997].new_cents == 7000
    assert out.loc[1997].churned_cents == 5000
    assert out.loc[1997].expansion_cents == 3000
    assert out.loc[1997].contraction_cents == 0
    # every customer's first year books as "new"
    assert out.loc[1996].new_cents == 15000


def test_order_total_allocation(ray_session, tmp_path):
    from ctdray.pipelines.analytics import order_total_allocation
    # order total 100.00 split over weights 1.00 / 2.00: base floors
    # 3333 / 6666, k = 10000-9999 = 1, largest remainder gets +1
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1], pa.int64()),
        "o_totalprice": pa.array([100.0]),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1], pa.int64()),
        "l_linenumber": pa.array([1, 2], pa.int32()),
        "l_extendedprice": pa.array([1.0, 2.0]),
        "l_returnflag": pa.array(["A", "R"]),
    }), str(tmp_path / "lineitem.parquet"))
    out = order_total_allocation(str(tmp_path)).to_pandas() \
        .set_index("l_returnflag")
    # rem: line1 (w=100): 10000*100 % 300 = 100; line2: 10000*200 % 300
    # = 200 -> line2 wins the +1
    assert out.loc["A"].allocated_cents == 3333
    assert out.loc["R"].allocated_cents == 6667
    assert out.allocated_cents.sum() == 10000


def test_quality_pass_by_length_decile(ray_session, tmp_path):
    from ctdray.pipelines.analytics import quality_pass_by_length_decile
    short = "tok " * 4
    good = "tok " * 20
    texts = [short.strip()] * 5 + [good.strip()] * 5
    pq.write_table(pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "text": pa.array(texts),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    out = quality_pass_by_length_decile(str(tmp_path)).to_pandas()
    total_pass = out.n_pass.sum()
    assert total_pass == 5                     # only the long docs pass
    assert out.n_docs.sum() == 10
    # the decile(s) containing short docs have pass_ppm == 0
    short_rows = out[out.pass_ppm == 0]
    assert short_rows.n_docs.sum() == 5

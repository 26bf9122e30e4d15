"""Batch 66: return-rate top10, bucketed join estimate, Lorenz curve,
intra-order concentration."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_brand_return_rate_top10(ray_session, tmp_path):
    from ctdray.pipelines.analytics import brand_return_rate_top10
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_brand": pa.array(["B1", "B2"]),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        # B1: 1/2 returned; B2: 0/1
        "l_partkey": pa.array([1, 1, 2], pa.int64()),
        "l_returnflag": pa.array(["R", "N", "N"]),
    }), str(tmp_path / "lineitem.parquet"))
    out = brand_return_rate_top10(str(tmp_path)).to_pandas()
    assert list(out.p_brand) == ["B1", "B2"]
    assert out.return_ppm[0] == 500_000
    assert out.return_ppm[1] == 0


def test_join_size_bucket_estimate(ray_session, tmp_path):
    from ctdray.pipelines.analytics import join_size_bucket_estimate
    # keys 0 (x3) and 16 (x1) share bucket 0: nl=4, dl=2 -> est 8;
    # exact = 9 + 1 = 10
    pq.write_table(pa.table({
        "l_orderkey": pa.array([0, 0, 0, 16], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = join_size_bucket_estimate(str(tmp_path)).to_pandas()
    assert out.est_rows[0] == 8
    assert out.exact_rows[0] == 10
    assert out.err_ppm[0] == 200_000


def test_customer_lorenz_curve(ray_session, tmp_path):
    from ctdray.pipelines.analytics import customer_lorenz_curve
    # two customers: 25 and 75 -> bottom half holds 250000 ppm
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([1, 2], pa.int64()),
        "o_totalprice": pa.array([25.0, 75.0]),
    }), str(tmp_path / "orders.parquet"))
    out = customer_lorenz_curve(str(tmp_path)).to_pandas() \
        .set_index("decile")
    assert out.loc[5].cum_share_ppm == 250_000
    assert out.loc[10].cum_share_ppm == 1_000_000
    # deciles below 1 customer round down to zero rows included
    assert out.loc[1].cum_share_ppm == 0


def test_order_line_concentration_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import order_line_concentration_hist
    pq.write_table(pa.table({
        # order 1: lines 90/10 -> share 900000 -> bucket 9
        # order 2: single line -> share 1000000 -> bucket 10
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_extendedprice": pa.array([90.0, 10.0, 5.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = order_line_concentration_hist(str(tmp_path)).to_pandas() \
        .set_index("bucket").sort_index()
    assert out.loc[9].n_orders == 1
    assert out.loc[10].n_orders == 1

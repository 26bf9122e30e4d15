"""Batch 22: skyline, fact-table relational division, band self-join,
exact weighted median."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_skyline_domination(ray_session, tmp_path):
    from ctdray.pipelines.analytics import part_skyline
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
        # (price, size): (1.00, 5) and (2.00, 9) on skyline;
        # (2.50, 9) dominated by (2.00, 9); (1.50, 3) dominated by
        # (1.00, 5)
        "p_retailprice": pa.array([1.00, 2.00, 2.50, 1.50]),
        "p_size": pa.array([5, 9, 9, 3], pa.int32()),
    }), str(tmp_path / "part.parquet"))
    out = part_skyline(str(tmp_path)).to_pandas()
    assert list(out.p_partkey) == [1, 2]


def test_division_all_priorities(ray_session, tmp_path):
    from ctdray.pipelines.analytics import customers_all_priorities
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(6), pa.int64()),
        # cust 1 hits both priorities (3 orders); cust 2 only one
        "o_custkey": pa.array([1, 1, 1, 2, 2, 2], pa.int64()),
        "o_orderpriority": pa.array(["1-URGENT", "5-LOW", "1-URGENT",
                                     "5-LOW", "5-LOW", "5-LOW"]),
    }), str(tmp_path / "orders.parquet"))
    out = customers_all_priorities(str(tmp_path)).to_pandas()
    assert list(out.o_custkey) == [1]
    assert list(out.n_orders) == [3]


def test_band_pairs_cross_bucket(ray_session, tmp_path):
    from ctdray.pipelines.analytics import part_price_band_pairs
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
        "p_brand": pa.array(["B1", "B1", "B1", "B2"]),
        # cents: 95, 105 (cross-bucket pair, diff 10), 300 (too far),
        # 100 but other brand
        "p_retailprice": pa.array([0.95, 1.05, 3.00, 1.00]),
    }), str(tmp_path / "part.parquet"))
    out = part_price_band_pairs(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert (out.part_a[0], out.part_b[0], out.price_diff_cents[0]) == \
        (1, 2, 10)


def test_weighted_median(ray_session, tmp_path):
    from ctdray.pipelines.analytics import weighted_median_price
    pq.write_table(pa.table({
        # values (cents): 100 w=1, 200 w=2, 90000 w=1 -> total 4,
        # cum at 200 = 3, 2*3 >= 4 -> median 200
        "l_extendedprice": pa.array([1.00, 2.00, 900.00]),
        "l_quantity": pa.array([1.0, 2.0, 1.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = weighted_median_price(str(tmp_path)).to_pandas()
    assert out.median_cents[0] == 200
    assert out.total_weight[0] == 4

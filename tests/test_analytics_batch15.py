"""TPC-H completion batch: Q6 pushdown scalar, Q9 profit by nation/year,
Q15 max-equality top supplier (ties), Q20-style dominant suppliers —
tiny hand-built inputs pin the exact semantics the DuckDB oracles verify
at driver scale."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_q6_band_filters_and_revenue_unit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import q6_forecast_revenue
    pq.write_table(pa.table({
        # line 1: in band (disc 6%, qty 10, 1995) -> 1000c*6 = 6000 e4
        # line 2: disc 4% out of band; line 3: qty 24 not < 24
        # line 4: shipped 1996 -> pruned at the read
        "l_extendedprice": pa.array([10.0, 10.0, 10.0, 10.0]),
        "l_discount": pa.array([0.06, 0.04, 0.06, 0.06]),
        "l_quantity": pa.array([10.0, 10.0, 24.0, 10.0]),
        "l_shipdate": pa.array([_ts("1995-06-01")] * 3 + [_ts("1996-06-01")],
                               pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = q6_forecast_revenue(str(tmp_path)).to_pandas()
    assert list(out.revenue_e4) == [6000]
    assert list(out.n_lines) == [1]


def test_q9_part_filter_and_nation_year(ray_session, tmp_path):
    from ctdray.pipelines.analytics import q9_profit_by_nation_year
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_name": pa.array(["red widget", "blue bolt"]),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([10, 20], pa.int64()),
        "s_nationkey": pa.array([0, 1], pa.int64()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_name": pa.array(["N0", "N1"]),
        "n_regionkey": pa.array([0, 0], pa.int64()),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([100, 101], pa.int64()),
        "o_orderdate": pa.array([_ts("1995-03-01"), _ts("1996-03-01")],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        # red part via supp 10 (N0) in 1995 and 1996; blue part excluded
        "l_orderkey": pa.array([100, 101, 100], pa.int64()),
        "l_partkey": pa.array([1, 1, 2], pa.int64()),
        "l_suppkey": pa.array([10, 10, 20], pa.int64()),
        "l_extendedprice": pa.array([10.0, 20.0, 99.0]),
        "l_discount": pa.array([0.0, 0.10, 0.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = q9_profit_by_nation_year(str(tmp_path)).to_pandas()
    got = {(n, y): c for n, y, c in zip(out.n_name, out.order_year,
                                        out.revenue_cp)}
    assert got == {("N0", 1995): 100000, ("N0", 1996): 2000 * 90}


def test_q15_max_equality_keeps_ties(ray_session, tmp_path):
    from ctdray.pipelines.analytics import q15_top_supplier
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["sa", "sb", "sc"]),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        # window [1995-01-01, 1995-04-01): supp1 30.00, supp2 30.00 (tie),
        # supp3 10.00; supp3's big line is outside the window
        "l_suppkey": pa.array([1, 2, 3, 3], pa.int64()),
        "l_extendedprice": pa.array([30.0, 30.0, 10.0, 99.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0]),
        "l_shipdate": pa.array(
            [_ts("1995-01-15"), _ts("1995-03-31"), _ts("1995-02-01"),
             _ts("1995-04-01")], pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = q15_top_supplier(str(tmp_path)).to_pandas()
    assert list(out.s_suppkey) == [1, 2]
    assert list(out.s_name) == ["sa", "sb"]
    assert list(out.total_cp) == [300000, 300000]


def test_q20_dominant_strictly_over_half(ray_session, tmp_path):
    from ctdray.pipelines.analytics import q20_dominant_suppliers
    pq.write_table(pa.table({
        # part 1: supp 10 ships 60/100 (>half) -> dominates
        # part 2: supps 10/20 split 50/50 -> NOBODY strictly over half
        # part 3: single supplier 20 -> dominates trivially
        "l_partkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "l_suppkey": pa.array([10, 20, 10, 20, 20], pa.int64()),
        "l_quantity": pa.array([60.0, 40.0, 5.0, 5.0, 7.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = q20_dominant_suppliers(str(tmp_path),
                             ppm=500_000).to_pandas()
    got = dict(zip(out.l_suppkey, out.n_dominated_parts))
    assert got == {10: 1, 20: 1}

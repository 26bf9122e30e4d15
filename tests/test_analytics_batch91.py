"""Batch 91: region trade matrix, part supplier price-spread histogram,
first-line dominance audit, per-source type-token ratio."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_region_trade_matrix(ray_session, tmp_path):
    from ctdray.pipelines.analytics import region_trade_matrix
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int32()),
        "r_name": pa.array(["EAST", "WEST"]),
    }), str(tmp_path / "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_regionkey": pa.array([0, 1], pa.int32()),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_nationkey": pa.array([0, 1], pa.int32()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1], pa.int64()),
        "c_nationkey": pa.array([0], pa.int32()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10], pa.int64()),
        "o_custkey": pa.array([1], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    # EAST cust buys 1.0 from EAST supp, 2.0 from WEST supp
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10], pa.int64()),
        "l_suppkey": pa.array([1, 2], pa.int64()),
        "l_extendedprice": pa.array([1.0, 2.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = region_trade_matrix(str(tmp_path)).to_pandas()
    rows = {(r.cust_region, r.supp_region): r.revenue_cents
            for r in out.itertuples()}
    assert rows == {("EAST", "EAST"): 100, ("EAST", "WEST"): 200}


def test_part_supplier_price_spread_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import part_supplier_price_spread_hist
    # part 1: supp 1 unit = 400c/2 = 200, supp 2 unit = 100/1 = 100
    #   spread 100 -> log2 bucket 6
    # part 2: single supplier -> spread 0 -> bucket -1
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 2], pa.int64()),
        "l_suppkey": pa.array([1, 2, 1], pa.int64()),
        "l_extendedprice": pa.array([4.0, 1.0, 5.0]),
        "l_quantity": pa.array([2.0, 1.0, 1.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = part_supplier_price_spread_hist(str(tmp_path)).to_pandas() \
        .set_index("spread_log2")
    assert out.loc[-1].n_parts == 1
    assert out.loc[6].n_parts == 1


def test_first_line_dominance_ppm(ray_session, tmp_path):
    from ctdray.pipelines.analytics import first_line_dominance_ppm
    # order 1: line1=300 line2=100 -> dominant
    # order 2: line1=100 line2=300 -> not
    # order 3: single line -> excluded
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "l_linenumber": pa.array([1, 2, 1, 2, 1], pa.int32()),
        "l_extendedprice": pa.array([3.0, 1.0, 1.0, 3.0, 9.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = first_line_dominance_ppm(str(tmp_path)).to_pandas()
    assert out.n_multi[0] == 2
    assert out.n_dominant[0] == 1
    assert out.dominance_ppm[0] == 500_000


def test_source_ttr_ppm(ray_session, tmp_path):
    from ctdray.pipelines.analytics import source_ttr_ppm
    # source A: tokens [the, the, cat] -> 2 types / 3 tokens
    # source B: tokens [dog, dog] -> 1 type / 2 tokens
    pq.write_table(pa.table({
        "doc_id": pa.array(["d1", "d2", "d3"]),
        "source": pa.array(["A", "A", "B"]),
        "text": pa.array(["the the", "cat", "dog dog"]),
    }), str(tmp_path / "documents.parquet"))
    out = source_ttr_ppm(str(tmp_path)).to_pandas().set_index("source")
    assert out.loc["A"].n_types == 2
    assert out.loc["A"].n_tokens == 3
    assert out.loc["A"].ttr_ppm == 666_666
    assert out.loc["B"].ttr_ppm == 500_000

"""Q13 order-count distribution (zero bucket), Q18 large-volume orders,
Q8 market-share ppm, and chunk-level boilerplate dedup stats — tiny
hand-built inputs pin the exact semantics the DuckDB oracles verify at
driver scale."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_order_count_distribution_includes_zero_bucket(ray_session,
                                                       tmp_path):
    from ctdray.pipelines.analytics import order_count_distribution
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 12], pa.int64()),
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    out = order_count_distribution(str(tmp_path)).to_pandas()
    got = dict(zip(out.c_count, out.custdist))
    assert got == {0: 1, 1: 1, 2: 1}


def test_q18_large_orders_having_then_join(ray_session, tmp_path):
    from ctdray.pipelines.analytics import q18_large_orders
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_name": pa.array(["alice", "bob"]),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11], pa.int64()),
        "o_custkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array([_ts("1995-01-01"), _ts("1995-02-01")],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([123.45, 10.0]),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        # order 10: 20 + 15 = 35 >= 30 kept; order 11: 10 dropped
        "l_orderkey": pa.array([10, 10, 11], pa.int64()),
        "l_quantity": pa.array([20.0, 15.0, 10.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = q18_large_orders(str(tmp_path), min_qty=30).to_pandas()
    assert list(out.o_orderkey) == [10]
    assert list(out.c_name) == ["alice"]
    assert list(out.total_cents) == [12345]
    assert list(out.sum_qty) == [35]


def test_q8_market_share_region_filter_and_ppm(ray_session, tmp_path):
    from ctdray.pipelines.analytics import q8_market_share
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int64()),
        "r_name": pa.array(["WEST", "EAST"]),
    }), str(tmp_path / "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int64()),
        "n_name": pa.array(["N0", "N1", "N2"]),
        "n_regionkey": pa.array([0, 1, 1], pa.int64()),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([100, 200], pa.int64()),
        "s_nationkey": pa.array([1, 2], pa.int64()),  # supp 100 is target N1
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        # cust 1 in region EAST (N2); cust 2 out of region (N0)
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_nationkey": pa.array([2, 0], pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11], pa.int64()),
        "o_custkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array([_ts("1995-06-01"), _ts("1995-07-01")],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        # order 10 (in-market): 10.00 from target supp + 30.00 from other
        # order 11 excluded (customer out of region) despite target supp
        "l_orderkey": pa.array([10, 10, 11], pa.int64()),
        "l_suppkey": pa.array([100, 200, 100], pa.int64()),
        "l_extendedprice": pa.array([10.0, 30.0, 99.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = q8_market_share(str(tmp_path), region="EAST",
                          nation="N1").to_pandas()
    assert list(out.order_year) == [1995]
    assert list(out.total_cp) == [400000]
    assert list(out.nation_cp) == [100000]
    assert list(out.share_ppm) == [250000]


def test_chunk_dedup_stats_cross_doc_and_within_doc(ray_session, tmp_path):
    from ctdray.pipelines.analytics import chunk_dedup_stats
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        # 2-token chunks: doc1 [ab, cd]; doc2 [ab, xy]; doc3 none (short);
        # doc4 [ab, ab] (within-doc repeat, still dup via docs 1/2)
        "text": pa.array(["a b c d", "a b x y", "z", "a b a b"]),
    }), str(tmp_path / "documents.parquet"))
    out = chunk_dedup_stats(str(tmp_path), chunk_tokens=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out.doc_id) == [1, 2, 4]
    assert list(out.n_chunks) == [2, 2, 2]
    assert list(out.n_dup_chunks) == [1, 1, 2]


def test_chunk_dedup_stats_unique_doc_zero_dups(ray_session, tmp_path):
    from ctdray.pipelines.analytics import chunk_dedup_stats
    pq.write_table(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["p q r s"]),
    }), str(tmp_path / "documents.parquet"))
    out = chunk_dedup_stats(str(tmp_path), chunk_tokens=2).to_pandas()
    assert list(out.n_chunks) == [2]
    assert list(out.n_dup_chunks) == [0]

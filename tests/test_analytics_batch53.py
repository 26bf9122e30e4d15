"""Batch 53: diversified top-k, degree assortativity, fingerprint
collision audit, brand rank churn."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_diversified_top_orders(ray_session, tmp_path):
    from ctdray.pipelines.analytics import diversified_top_orders
    # customer 1 has the 3 biggest orders but only 2 may survive
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
        "o_totalprice": pa.array([900.0, 800.0, 700.0, 100.0]),
    }), str(tmp_path / "orders.parquet"))
    out = diversified_top_orders(str(tmp_path), n=3).to_pandas()
    assert list(out.o_orderkey) == [1, 2, 4]


def test_coorder_degree_assortativity(ray_session, tmp_path):
    from ctdray.pipelines.analytics import coorder_degree_assortativity
    # order 1: parts {1,2,3} -> edges (1,2),(1,3),(2,3); all degrees 2
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 1], pa.int64()),
        "l_partkey": pa.array([1, 2, 3], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = coorder_degree_assortativity(str(tmp_path)).to_pandas()
    assert out.n_edges[0] == 3
    assert out.sum_dudv[0] == 12     # 3 edges × 2·2
    assert out.sum_deg[0] == 12
    assert out.sum_degsq[0] == 24


def test_fingerprint_collision_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import fingerprint_collision_audit
    pq.write_table(pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        # two distinct texts + one duplicate -> 2 distinct fingerprints
        "text": pa.array(["aa", "aa", "bb"]),
    }), str(tmp_path / "documents.parquet"))
    out = fingerprint_collision_audit(str(tmp_path)).to_pandas()
    # md5('aa') and md5('bb') differ in the first 4 hex chars
    assert list(out.bucket_size) == [1]
    assert list(out.n_buckets) == [2]


def test_brand_rank_churn(ray_session, tmp_path):
    from ctdray.pipelines.analytics import brand_rank_churn
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array([_ts("1995-06-01"), _ts("1996-06-01")],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_brand": pa.array(["B1", "B2"]),
    }), str(tmp_path / "part.parquet"))
    # 1995: B1=100, B2=50 -> ranks 1,2 ; 1996: B1=10, B2=90 -> 2,1
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2], pa.int64()),
        "l_partkey": pa.array([1, 2, 1, 2], pa.int64()),
        "l_extendedprice": pa.array([100.0, 50.0, 10.0, 90.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = brand_rank_churn(str(tmp_path)).to_pandas().set_index("brand")
    assert out.loc["B1"].rank_churn == 1
    assert out.loc["B2"].rank_churn == 1
    assert out.loc["B1"].n_years == 2

"""Batch 110: integer PageRank, dim-cov sign census, YoY sign
matrix, supplier reach histogram."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_coorder_pagerank2(ray_session, tmp_path):
    from ctdray.pipelines.analytics import coorder_pagerank2
    # path graph 1-2, 2-3 (orders {1,2} and {2,3}):
    # deg: 1->1, 2->2, 3->1
    # r1(1) = 150000 + 850*(1e6//2)//1000 = 575000
    # r1(2) = 150000 + 2*850*(1e6//1)//1000 = 1850000
    # r1(3) = 575000
    # r2(1) = 150000 + 850*(1850000//2)//1000 = 936250
    # r2(2) = 150000 + 2*850*(575000//1)//1000 = 1127500
    # r2(3) = 936250
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10, 20, 20], pa.int64()),
        "l_partkey": pa.array([1, 2, 2, 3], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = coorder_pagerank2(str(tmp_path)).to_pandas()
    assert out.part.tolist() == [2, 1, 3]
    assert out.r2.tolist() == [1127500, 936250, 936250]
    assert out.degree.tolist() == [2, 1, 1]


def test_embedding_dim_cov_sign_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import embedding_dim_cov_sign_census
    # dim0 == dim1 (perfect +), dim2 = -dim0 (perfect -),
    # dim3 constant (zero cov with everything)
    rng = np.random.default_rng(5)
    x = rng.normal(size=8)
    emb = [[float(v), float(v), float(-v), 1.0] + [0.0] * 60
           for v in x]
    pq.write_table(pa.table({
        "vec_id": pa.array(list(range(8)), pa.int64()),
        "embedding": pa.array(emb, pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))
    out = embedding_dim_cov_sign_census(str(tmp_path)).to_pandas()
    assert out.n_pairs[0] == 2016
    # (0,1) positive; (0,2) and (1,2) negative; all pairs with dim3+
    # and the zero dims are zero
    assert out.n_pos[0] == 1
    assert out.n_neg[0] == 2
    assert out.n_zero[0] == 2013


def test_monthly_yoy_sign_matrix(ray_session, tmp_path):
    from ctdray.pipelines.analytics import monthly_yoy_sign_matrix
    # Jan 1995: 100, Jan 1996: 200 -> up; Feb 1995: 100,
    # Feb 1996: 50 -> down; Mar only 1996 -> no pair
    pq.write_table(pa.table({
        "o_orderdate": pa.array(
            [_ts("1995-01-10"), _ts("1996-01-20"), _ts("1995-02-10"),
             _ts("1996-02-02"), _ts("1996-03-05")],
            pa.timestamp("us")),
        "o_totalprice": pa.array([1.0, 2.0, 1.0, 0.5, 9.9]),
    }), str(tmp_path / "orders.parquet"))
    out = monthly_yoy_sign_matrix(str(tmp_path)).to_pandas()
    assert out.month.tolist() == [1, 2]
    assert out.n_up.tolist() == [1, 0]
    assert out.n_down.tolist() == [0, 1]


def test_supplier_distinct_orders_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import supplier_distinct_orders_hist
    # supplier 1 serves orders {10, 20} (dup line collapses) -> 2;
    # supplier 2 serves {10} -> 1; width 2 -> buckets 1 and 0
    pq.write_table(pa.table({
        "l_suppkey": pa.array([1, 1, 1, 2], pa.int64()),
        "l_orderkey": pa.array([10, 10, 20, 10], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = supplier_distinct_orders_hist(str(tmp_path),
                                        width=2).to_pandas()
    assert dict(zip(out.reach_bucket, out.n_suppliers)) == {0: 1, 1: 1}

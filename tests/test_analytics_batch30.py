"""Batch 30: order-total consistency, linenumber gap audit, norm
outliers, value concentration histogram."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_total_consistency(ray_session, tmp_path):
    from ctdray.pipelines.analytics import order_total_consistency
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        # order 1 matches its lines (3.00); order 2 off by 50 cents
        "o_totalprice": pa.array([3.00, 5.50]),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_extendedprice": pa.array([1.00, 2.00, 5.00]),
    }), str(tmp_path / "lineitem.parquet"))
    out = order_total_consistency(str(tmp_path)).to_pandas()
    assert (out.n_orders[0], out.n_exact[0],
            out.max_abs_diff_cents[0]) == (2, 1, 50)


def test_linenumber_gaps(ray_session, tmp_path):
    from ctdray.pipelines.analytics import lineitem_linenumber_gaps
    pq.write_table(pa.table({
        # order 1: 1,2,3 ok; order 2: 1,3 hole; order 3: 1,1 dup
        "l_orderkey": pa.array([1, 1, 1, 2, 2, 3, 3], pa.int64()),
        "l_linenumber": pa.array([1, 2, 3, 1, 3, 1, 1], pa.int32()),
    }), str(tmp_path / "lineitem.parquet"))
    out = lineitem_linenumber_gaps(str(tmp_path)).to_pandas()
    assert (out.n_orders[0], out.n_gapped[0]) == (3, 2)


def test_norm_outliers(ray_session, tmp_path):
    from ctdray.pipelines.analytics import embedding_norm_outlier_ids
    vecs = [[0.1, 0.0]] * 9 + [[5.0, 5.0]]
    pq.write_table(pa.table({
        "vec_id": pa.array(range(10), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0] * 10, pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))
    out = embedding_norm_outlier_ids(str(tmp_path), q=0.5).to_pandas()
    # only the big vector exceeds the median norm strictly
    assert list(out.vec_id) == [9]


def test_concentration_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import order_value_concentration_hist
    pq.write_table(pa.table({
        # order 1: lines 9.00+1.00 -> max share 900000 ppm -> bucket 9
        # order 2: single line -> 1000000 ppm -> bucket 10
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_extendedprice": pa.array([9.00, 1.00, 4.00]),
    }), str(tmp_path / "lineitem.parquet"))
    out = order_value_concentration_hist(str(tmp_path)).to_pandas()
    got = dict(zip(out.share_bucket, out.n_orders))
    assert got == {9: 1, 10: 1}

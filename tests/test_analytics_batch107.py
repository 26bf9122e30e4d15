"""Batch 107: per-user Simpson deciles, shuffle skew audit,
alphabetical-order share, discount-tax net grid."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_user_type_simpson_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_type_simpson_hist
    # user 1: a,a,b -> num = 2, nt(nt-1) = 6 -> ppm 333333 -> dec 3
    # user 2: a,a -> num 2 / 2 -> ppm 1e6 -> dec 10
    # user 3: single event -> dropped
    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "event_type": pa.array(["a", "a", "b", "a", "a", "z"]),
    }), str(tmp_path / "events.parquet"))
    out = user_type_simpson_hist(str(tmp_path)).to_pandas()
    assert dict(zip(out.simpson_decile, out.n_users)) == {3: 1, 10: 1}


def test_shuffle_skew_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import shuffle_skew_audit
    # custkeys 0,0,0,1 -> bucket 0 load 3, bucket 1 load 1
    pq.write_table(pa.table({
        "o_custkey": pa.array([0, 0, 0, 1], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    out = shuffle_skew_audit(str(tmp_path)).to_pandas()
    assert out.n_buckets_used[0] == 2
    assert out.max_load[0] == 3
    assert out.total_rows[0] == 4
    assert out.skew_ppm[0] == 1_000_000 * 3 * 256 // 4


def test_doc_alpha_order_share_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import doc_alpha_order_share_hist
    # "a b c": both pairs ordered -> 10; "c b a": none -> 0;
    # "b a c": 1 of 2 -> 5; single-token doc dropped
    pq.write_table(pa.table({
        "text": pa.array(["a b c", "c b a", "b a c", "solo"]),
    }), str(tmp_path / "documents.parquet"))
    out = doc_alpha_order_share_hist(str(tmp_path)).to_pandas()
    assert dict(zip(out.alpha_decile, out.n_docs)) == {0: 1, 5: 1,
                                                       10: 1}


def test_discount_tax_net_grid(ray_session, tmp_path):
    from ctdray.pipelines.analytics import discount_tax_net_grid
    # (d=10, t=5): 2.00 -> 200*90*105 = 1890000; plus 1.00 -> 945000
    # (d=0, t=0): 1.00 -> 100*100*100 = 1000000
    pq.write_table(pa.table({
        "l_discount": pa.array([0.10, 0.10, 0.0]),
        "l_tax": pa.array([0.05, 0.05, 0.0]),
        "l_extendedprice": pa.array([2.0, 1.0, 1.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = discount_tax_net_grid(str(tmp_path)).to_pandas()
    assert out.d_pct.tolist() == [0, 10]
    assert out.n_lines.tolist() == [1, 2]
    assert out.net_e4.tolist() == ["1000000", "2835000"]

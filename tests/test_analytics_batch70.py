"""Batch 70: Spearman d2, activation gap median, keyspace
fragmentation, filter ablation."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_customer_rank_spearman_d2(ray_session, tmp_path):
    from ctdray.pipelines.analytics import customer_rank_spearman_d2
    # cust 1: revenue 100 (r1=2), 3 orders (r2=1)
    # cust 2: revenue 300 (r1=1), 1 order  (r2=2) -> d2 = 1 + 1 = 2
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(4), pa.int64()),
        "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
        "o_totalprice": pa.array([40.0, 30.0, 30.0, 300.0]),
    }), str(tmp_path / "orders.parquet"))
    out = customer_rank_spearman_d2(str(tmp_path)).to_pandas()
    assert out.n_customers[0] == 2
    assert out.sum_d2[0] == 2


def test_activation_gap_median_days(ray_session, tmp_path):
    from ctdray.pipelines.analytics import activation_gap_median_days
    # cust1 gap 3d; cust2 gap 7d; cust3 single order (excluded)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(5), pa.int64()),
        "o_custkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "o_orderdate": pa.array([_ts("1996-01-01"), _ts("1996-01-04"),
                                 _ts("1996-02-01"), _ts("1996-02-08"),
                                 _ts("1996-03-01")], pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    out = activation_gap_median_days(str(tmp_path)).to_pandas()
    assert list(out.value) == [3.0]     # lower median of {3, 7}


def test_orderkey_fragmentation(ray_session, tmp_path):
    from ctdray.pipelines.analytics import orderkey_fragmentation
    # keys 1,2,3, 7,8, 20 -> fragments 3, missing 20-1+1-6 = 14
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 7, 8, 20], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    out = orderkey_fragmentation(str(tmp_path)).to_pandas()
    assert out.n_keys[0] == 6
    assert out.n_fragments[0] == 3
    assert out.total_missing[0] == 14


def test_quality_filter_ablation(ray_session, tmp_path):
    from ctdray.pipelines.analytics import quality_filter_ablation
    short = "tok tok"
    stopy = " ".join(["the"] * 20)
    good = " ".join(["tok"] * 20)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array([short, stopy, good]),
    }), str(tmp_path / "documents.parquet"))
    out = quality_filter_ablation(str(tmp_path)).to_pandas()
    assert out.n_docs[0] == 3
    assert out.n_fail_short[0] == 1
    assert out.n_fail_long[0] == 0
    assert out.n_fail_stopword[0] == 1
    assert out.n_pass[0] == 1

"""Batch 111: min-label rounds, PPS systematic sampling, width
transition matrix, intra-doc shingle repeats."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_coorder_minlabel_rounds(ray_session, tmp_path):
    from ctdray.pipelines.analytics import coorder_minlabel_rounds
    # path graph 1-2, 2-3: r0 = {1,2,3} (n=3, sum=6);
    # r1 = {1:1, 2:1, 3:2} (n=2, sum=4); r2 = all 1 (n=1, sum=3)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10, 20, 20], pa.int64()),
        "l_partkey": pa.array([1, 2, 2, 3], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = coorder_minlabel_rounds(str(tmp_path)).to_pandas()
    assert out["round"].tolist() == [0, 1, 2, 3]
    assert out.n_labels.tolist() == [3, 2, 1, 1]
    assert out.sum_labels.tolist() == [6, 4, 3, 3]


def test_pps_systematic_sample_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import pps_systematic_sample_audit
    # total weight 5 < 64 samples -> step 1, start 0: every unit of
    # weight is a grid point, so hits == weight for every customer
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 2, 2, 2], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_nationkey": pa.array([0, 1], pa.int32()),
    }), str(tmp_path / "customer.parquet"))
    out = pps_systematic_sample_audit(str(tmp_path)).to_pandas() \
        .set_index("nationkey")
    assert out.loc[0].n_selected == 1 and out.loc[0].n_hits == 2
    assert out.loc[0].sel_weight == 2
    assert out.loc[1].n_selected == 1 and out.loc[1].n_hits == 3
    assert out.loc[1].sel_weight == 3


def test_order_width_transition_matrix(ray_session, tmp_path):
    from ctdray.pipelines.analytics import order_width_transition_matrix
    # customer 1: widths 1 -> 2 -> 7(capped from 9); customer 2: one
    # order only, no transition
    ok = [1] * 1 + [2] * 2 + [3] * 9 + [4] * 2
    pq.write_table(pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
        "o_orderdate": pa.array([_ts("1995-01-01"), _ts("1995-02-01"),
                                 _ts("1995-03-01"), _ts("1995-01-01")],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    out = order_width_transition_matrix(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(1, 2, 1), (2, 7, 1)]


def test_doc_internal_shingle_repeats(ray_session, tmp_path):
    from ctdray.pipelines.analytics import doc_internal_shingle_repeats
    # "a b a b": bigrams [ab, ba, ab] -> 1 repeat; "x y z" -> 0;
    # "c c c c": [cc, cc, cc] -> 2 repeats
    pq.write_table(pa.table({
        "text": pa.array(["a b a b", "x y z", "c c c c"]),
    }), str(tmp_path / "documents.parquet"))
    out = doc_internal_shingle_repeats(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(0, 1), (1, 1), (2, 1)]

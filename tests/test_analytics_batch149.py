"""Batch 149: PR curve, filter Shapley, t-closeness, Gini mean diff."""
import pyarrow as pa
import pyarrow.parquet as pq


def test_length_rule_pr_curve(ray_session, tmp_path):
    from ctdray.pipelines.analytics import length_rule_pr_curve
    clean12 = " ".join(f"w{i}" for i in range(12))
    short5 = "aa bb cc dd ee"
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([clean12, short5]),
        "n_chars": pa.array([60, 150], pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    out = length_rule_pr_curve(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (50, 1, 1, 0, 0, 500000, 1000000),
        (100, 0, 1, 1, 0, 0, 0),
        (200, 0, 0, 1, 1, 0, 0),
        (400, 0, 0, 1, 1, 0, 0),
        (800, 0, 0, 1, 1, 0, 0)]


def test_filter_shapley_attribution(ray_session, tmp_path):
    from ctdray.pipelines.analytics import filter_shapley_attribution
    clean12 = " ".join(f"w{i}" for i in range(12))
    stop12 = "the the the the the the the w1 w2 w3 w4 w5"
    short5 = "aa bb cc dd ee"
    allstop4 = "the the the the"
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([short5, stop12, clean12, allstop4]),
    }), str(tmp_path / "documents.parquet"))
    out = filter_shapley_attribution(str(tmp_path)).to_pandas()
    got = {r[0]: (r[1], r[2]) for r in out.values}
    # masks: 6, 3, 7, 2 -> shapley split of the 3 removed docs
    assert got == {"min_tokens": (2, 9), "max_tokens": (0, 0),
                   "stopword_share": (2, 9)}
    assert sum(v[1] for v in got.values()) == 6 * 3


def test_segment_priority_tcloseness(ray_session, tmp_path):
    from ctdray.pipelines.analytics import segment_priority_tcloseness
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_mktsegment": pa.array(["A", "B"]),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 2, 2], pa.int64()),
        "o_orderpriority": pa.array(["1", "1", "1", "2"]),
    }), str(tmp_path / "orders.parquet"))
    out = segment_priority_tcloseness(str(tmp_path)).to_pandas()
    # glob cum=[3], A: |4*2-2*3|=2, B: |4*1-2*3|=2; den=1*2*4=8
    assert sorted(map(tuple, out.values)) == [
        ("A", 2, 2, 250000), ("B", 2, 2, 250000)]


def test_quantity_gini_mean_difference(ray_session, tmp_path):
    from ctdray.pipelines.analytics import \
        quantity_gini_mean_difference
    pq.write_table(pa.table({
        "l_quantity": pa.array([1.0, 1.0, 3.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = quantity_gini_mean_difference(str(tmp_path)).to_pandas()
    # pairs gap sum = 2*(3-1)*2*1 = 8; rel = 8e6 // (2*5) = 800000
    assert list(map(tuple, out.values)) == [(3, 5, 8, 800000)]

"""Batch 16: adapted TPC-H Q12/Q16, distributed corpus-frequency doc
scoring, and the A->B->A ping-pong window pattern -- tiny hand-built
inputs pin the exact semantics the DuckDB oracles verify at driver
scale."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_q12_lateness_and_priority_split(ray_session, tmp_path):
    from ctdray.pipelines.analytics import q12_late_lines_by_priority
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderdate": pa.array([_ts("1995-01-01")] * 3,
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "5-LOW", "2-HIGH"]),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        # order 1: late (urgent -> high); order 2: late (low);
        # order 3: exactly +60d, NOT late (strict >)
        "l_orderkey": pa.array([1, 2, 3], pa.int64()),
        "l_returnflag": pa.array(["A", "A", "A"]),
        "l_shipdate": pa.array([_ts("1995-03-15"), _ts("1995-03-15"),
                                _ts("1995-03-02")], pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = q12_late_lines_by_priority(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert out.high_line_count[0] == 1 and out.low_line_count[0] == 1


def test_q16_distinct_suppliers_with_exclusions(ray_session, tmp_path):
    from ctdray.pipelines.analytics import q16_supplier_variety
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_brand": pa.array(["Brand#2", "Brand#1"]),
        "p_size": pa.array([5, 5], pa.int32()),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([10, 11, 12], pa.int64()),
        "s_acctbal": pa.array([100.0, -5.0, 7.0]),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        # part 1 via supp 10 (x2 -> distinct once), 11 (complaint,
        # excluded), 12; part 2 excluded brand
        "l_partkey": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "l_suppkey": pa.array([10, 10, 11, 12, 10], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = q16_supplier_variety(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert (out.p_brand[0], out.p_size[0], out.supplier_cnt[0]) == \
        ("Brand#2", 5, 2)


def test_doc_token_commonness_counts(ray_session, tmp_path):
    from ctdray.pipelines.analytics import doc_token_commonness
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        # global counts: a=3, b=2, c=1
        "text": pa.array(["a b a", "a b c"]),
    }), str(tmp_path / "documents.parquet"))
    out = doc_token_commonness(str(tmp_path)).to_pandas() \
        .set_index("doc_id").sort_index()
    assert list(out.sum_commonness) == [3 + 2 + 3, 3 + 2 + 1]
    assert list(out.min_commonness) == [2, 1]
    assert list(out.n_tokens) == [3, 3]


def test_ping_pong_aba_only(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_ping_pong_transitions
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "ts": pa.array([_ts(f"2024-01-01T00:0{i}:00") for i in
                        range(6)], pa.timestamp("us")),
        "user_id": pa.array([7, 7, 7, 7, 7, 7], pa.int64()),
        # v c v  -> (v,c); c v c -> (c,v); v c c -> no (A==B guard);
        # c c x -> no
        "event_type": pa.array(["view", "cart", "view", "cart", "cart",
                                "x"]),
        "value": pa.array([0.0] * 6),
    }), str(tmp_path / "events.parquet"))
    out = user_ping_pong_transitions(str(tmp_path)).to_pandas()
    got = {(a, b): n for a, b, n in
           zip(out.a_type, out.b_type, out.n)}
    assert got == {("view", "cart"): 1, ("cart", "view"): 1}

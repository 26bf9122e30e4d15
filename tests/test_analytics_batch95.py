"""Batch 95: segment basket-size matrix, session size-duration
covariance, max token-run top-k, per-bucket doc packing plan."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_segment_basket_size_matrix(ray_session, tmp_path):
    from ctdray.pipelines.analytics import segment_basket_size_matrix
    # seg A: order 1 (2 lines), order 2 (1 line); seg B: order 3 (1)
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_mktsegment": pa.array(["A", "B"]),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = segment_basket_size_matrix(str(tmp_path)).to_pandas()
    rows = {(r.c_mktsegment, r.lines_bucket): r.n_orders
            for r in out.itertuples()}
    assert rows == {("A", 1): 1, ("A", 2): 1, ("B", 1): 1}


def test_session_size_duration_cov(ray_session, tmp_path):
    from ctdray.pipelines.analytics import session_size_duration_cov
    # user 1: session A = 2 events spanning 60s; session B (after
    # >30min gap) = 1 event, 0s.
    # x = (2, 1), y = (60e6, 0): n=3? no — n=2 sessions
    # cov_num = 2*(2*60e6) - 3*60e6 = 240e6 - 180e6 = 60e6
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([_ts("2024-01-01T00:00"),
                        _ts("2024-01-01T00:01"),
                        _ts("2024-01-01T02:00")], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "event_type": pa.array(["a"] * 3),
        "value": pa.array([0.0] * 3),
    }), str(tmp_path / "events.parquet"))
    out = session_size_duration_cov(str(tmp_path)).to_pandas()
    assert out.n_sessions[0] == 2
    assert out.sum_events[0] == 3
    assert out.sum_duration_us[0] == 60_000_000
    assert out.cov_num[0] == str(2 * 2 * 60_000_000 - 3 * 60_000_000)


def test_doc_max_token_run_topk(ray_session, tmp_path):
    from ctdray.pipelines.analytics import doc_max_token_run_topk
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a a a b", "x y x y"]),
    }), str(tmp_path / "documents.parquet"))
    out = doc_max_token_run_topk(str(tmp_path)).to_pandas()
    assert list(out.doc_id) == [1, 2]
    assert list(out.max_run) == [3, 1]


def test_doc_pack_plan_by_bucket(ray_session, tmp_path):
    from ctdray.pipelines.analytics import doc_pack_plan_by_bucket
    # bucket 0: docs 0 (3 toks) and 16 (3 toks) -> capacity 5 forces
    # two files; bucket 1: doc 1 (2 toks) -> one file
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 16, 1], pa.int64()),
        "text": pa.array(["a b c", "d e f", "g h"]),
    }), str(tmp_path / "documents.parquet"))
    out = doc_pack_plan_by_bucket(str(tmp_path), capacity=5) \
        .to_pandas().set_index("bucket")
    assert out.loc[0].n_docs == 2
    assert out.loc[0].n_files == 2
    assert out.loc[0].total_tokens == 6
    assert out.loc[1].n_files == 1

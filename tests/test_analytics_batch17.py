"""Batch 17: sliding-window chunker, relational division (tokens in all
langs), RFM NTILE scoring, global value-decile cross-tab."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_chunker_windows_and_tail(ray_session, tmp_path):
    from ctdray.pipelines.analytics import doc_chunks_sliding
    pq.write_table(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["t0 t1 t2 t3 t4 t5 t6 t7 t8"]),  # 9 tokens
    }), str(tmp_path / "documents.parquet"))
    out = doc_chunks_sliding(str(tmp_path)).to_pandas() \
        .sort_values("chunk_idx")
    assert list(out.chunk_idx) == [0, 1, 2]
    assert list(out.chunk_text) == [
        "t0 t1 t2 t3 t4 t5", "t4 t5 t6 t7 t8", "t8"]
    assert list(out.n_tokens) == [6, 5, 1]


def test_relational_division_all_langs(ray_session, tmp_path):
    from ctdray.pipelines.analytics import tokens_in_all_langs
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        # "a" in en+fr (3 docs); "b" only en; "c" only fr
        "text": pa.array(["a b", "a b", "a c"]),
        "lang": pa.array(["en", "en", "fr"]),
    }), str(tmp_path / "documents.parquet"))
    out = tokens_in_all_langs(str(tmp_path)).to_pandas()
    assert list(out.tok) == ["a"]
    assert list(out.n_langs) == [2] and list(out.n_docs) == [3]


def test_rfm_ntile_semantics(ray_session, tmp_path):
    from ctdray.pipelines.analytics import customer_rfm_scores
    # 5 customers, k=4 -> bucket sizes 2,1,1,1 over each metric order
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 2, 3, 4, 5, 1], pa.int64()),
        "o_orderdate": pa.array(
            [_ts(f"1995-01-0{d}") for d in (1, 2, 3, 4, 5, 6)],
            pa.timestamp("us")),
        "o_totalprice": pa.array([10.0, 20.0, 30.0, 40.0, 50.0, 5.0]),
    }), str(tmp_path / "orders.parquet"))
    out = customer_rfm_scores(str(tmp_path)).to_pandas() \
        .set_index("o_custkey")
    # recency order (last_dt, ck): 2,3,4,5,1 -> ntile 1,1,2,3,4
    assert list(out.r_score) == [4, 1, 1, 2, 3]
    # frequency (n, ck): 2..5 have 1 order, 1 has 2 -> order 2,3,4,5,1
    assert list(out.f_score) == [4, 1, 1, 2, 3]
    # monetary cents: 1->1500, 2->2000, 3->3000, 4->4000, 5->5000
    assert list(out.m_score) == [1, 1, 2, 3, 4]
    assert out.rfm_code[1] == 100 * 4 + 10 * 4 + 1


def test_value_decile_matrix_counts(ray_session, tmp_path):
    from ctdray.pipelines.analytics import value_decile_matrix
    n = 20
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([_ts("2024-01-01")] * n, pa.timestamp("us")),
        "user_id": pa.array([0] * n, pa.int64()),
        # values 0..19, types alternate; decile d holds values 2d-2,2d-1
        "event_type": pa.array(["a", "b"] * (n // 2)),
        "value": pa.array([float(i) for i in range(n)]),
    }), str(tmp_path / "events.parquet"))
    out = value_decile_matrix(str(tmp_path)).to_pandas()
    got = {(t, d): c for t, d, c in zip(out.event_type, out.decile,
                                        out.n)}
    # each decile = {even value -> a, odd value -> b}, one each
    for d in range(1, 11):
        assert got[("a", d)] == 1 and got[("b", d)] == 1

"""Batch 44: FK-integrity audit, embedding sign balance, token length
by lang, event-type run-length encoding."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_referential_integrity_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import referential_integrity_audit
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64())}),
        str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([10], pa.int64())}),
        str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([100], pa.int64()),
        "c_nationkey": pa.array([5], pa.int32())}),
        str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([5], pa.int32())}),
        str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([100, 999], pa.int64())}),
        str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2, 3], pa.int64()),
        "l_suppkey": pa.array([10, 11, 10], pa.int64())}),
        str(tmp_path / "lineitem.parquet"))
    out = referential_integrity_audit(str(tmp_path)).to_pandas() \
        .set_index("fk")
    assert out.loc["lineitem.l_partkey->part"].n_orphans == 1
    assert out.loc["lineitem.l_suppkey->supplier"].n_orphans == 1
    assert out.loc["orders.o_custkey->customer"].n_orphans == 1
    assert out.loc["customer.c_nationkey->nation"].n_orphans == 0
    assert out.loc["lineitem.l_partkey->part"].n_rows == 3


def test_embedding_dim_sign_balance(ray_session, tmp_path):
    from ctdray.pipelines.analytics import embedding_dim_sign_balance
    vecs = np.zeros((3, 64), dtype=np.float32)
    vecs[0, 0] = 0.5
    vecs[1, 0] = -0.5
    vecs[2, 0] = 0.00001          # rounds to 0 at e4
    vecs[:, 1] = 1.0
    pq.write_table(pa.table({
        "vec_id": pa.array(range(3), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array([0, 0, 0], pa.int32())}),
        str(tmp_path / "embeddings.parquet"))
    out = embedding_dim_sign_balance(str(tmp_path)).to_pandas() \
        .set_index("dim").sort_index()
    assert (out.loc[0].n_pos, out.loc[0].n_neg, out.loc[0].n_zero) \
        == (1, 1, 1)
    assert out.loc[1].n_pos == 3
    assert out.loc[2].n_zero == 3


def test_avg_token_len_by_lang(ray_session, tmp_path):
    from ctdray.pipelines.analytics import avg_token_len_by_lang
    pq.write_table(pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        # eng: "ab cd" + "xyz" -> 3 tokens, 7 chars -> 2333333 ppm
        "text": pa.array(["ab cd", "xyz", "a bb"]),
        "lang": pa.array(["eng", "eng", "deu"]),
    }), str(tmp_path / "documents.parquet"))
    out = avg_token_len_by_lang(str(tmp_path)).to_pandas() \
        .set_index("lang")
    assert out.loc["eng"].n_tokens == 3
    assert out.loc["eng"].tok_chars == 7
    assert out.loc["eng"].avg_len_ppm == 2_333_333
    assert out.loc["deu"].n_tokens == 2
    assert out.loc["deu"].tok_chars == 3
    assert out.loc["deu"].n_docs == 1


def test_user_type_run_counts(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_type_run_counts
    # user 7 ordered types: a a b b b a -> runs [2,3,1] -> 3 runs, max 3
    pq.write_table(pa.table({
        "event_id": pa.array(range(6), pa.int64()),
        "ts": pa.array([_ts(f"2024-01-01T0{i}:00") for i in range(6)],
                       pa.timestamp("us")),
        "user_id": pa.array([7] * 6, pa.int64()),
        "event_type": pa.array(["a", "a", "b", "b", "b", "a"]),
        "value": pa.array([0.0] * 6),
    }), str(tmp_path / "events.parquet"))
    out = user_type_run_counts(str(tmp_path)).to_pandas()
    assert out.n_runs[0] == 3
    assert out.longest_run[0] == 3

"""Batch 88: supplier part-Jaccard top-k, embedding sign-bucket
histogram, sentence-length histogram, daily type-mix L1 churn."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_supplier_part_jaccard_topk(ray_session, tmp_path):
    from ctdray.pipelines.analytics import supplier_part_jaccard_topk
    # supp 1: parts {10, 11}; supp 2: parts {10, 11}; supp 3: {12}
    # J(1,2) = 2/2 = 1.0; no other pair shares a part
    pq.write_table(pa.table({
        "l_orderkey": pa.array(range(6), pa.int64()),
        "l_partkey": pa.array([10, 11, 10, 11, 12, 10], pa.int64()),
        "l_suppkey": pa.array([1, 1, 2, 2, 3, 1], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = supplier_part_jaccard_topk(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert (out.s1[0], out.s2[0]) == (1, 2)
    assert out.shared[0] == 2
    assert out.jaccard_ppm[0] == 1_000_000


def test_embedding_signbucket_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import embedding_signbucket_hist
    # signs of first 2 dims: (+,+)->3, (-,+)->2, (+,+)->3
    pq.write_table(pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([[0.5, 0.5], [-0.5, 0.5], [0.1, 0.9]],
                              pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))
    out = embedding_signbucket_hist(str(tmp_path), n_dims=2).to_pandas()
    rows = dict(zip(out.bucket, out.n_vectors))
    assert rows == {2: 1, 3: 2}


def test_sentence_len_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import sentence_len_hist
    # "a b. c" -> sentences ["a b", "c"] -> lens 2, 1
    # "x y z" -> ["x y z"] -> len 3
    pq.write_table(pa.table({
        "doc_id": pa.array(["d1", "d2"]),
        "text": pa.array(["a b. c", "x y z"]),
    }), str(tmp_path / "documents.parquet"))
    out = sentence_len_hist(str(tmp_path)).to_pandas() \
        .set_index("sentence_tokens")
    assert out.loc[1].n_sentences == 1
    assert out.loc[2].n_sentences == 1
    assert out.loc[3].n_sentences == 1


def test_daily_type_mix_l1(ray_session, tmp_path):
    from ctdray.pipelines.analytics import daily_type_mix_l1
    # day 1: 2xa 2xb (50/50); day 2: 4xa (100/0) -> L1 = 0.5+0.5 = 1.0
    ts = [_ts("2024-01-01T00:00")] * 4 + [_ts("2024-01-02T00:00")] * 4
    pq.write_table(pa.table({
        "event_id": pa.array(range(8), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1] * 8, pa.int64()),
        "event_type": pa.array(["a", "a", "b", "b"] + ["a"] * 4),
        "value": pa.array([0.0] * 8),
    }), str(tmp_path / "events.parquet"))
    out = daily_type_mix_l1(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert out.l1_ppm[0] == 1_000_000

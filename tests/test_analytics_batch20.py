"""Batch 20: Gram-matrix dimension correlations, iterative BFS over the
co-order graph, cross-corpus n-gram novelty."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_dim_correlation_gram(ray_session, tmp_path):
    from ctdray.pipelines.analytics import dim_correlation_topk
    # 3-dim vectors; dims 0,1 identical -> dominant pair
    pq.write_table(pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[1.0, 1.0, 0.5], [2.0, 2.0, -1.0]],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 0], pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))
    out = dim_correlation_topk(str(tmp_path), n=3).to_pandas()
    assert (out.dim_a[0], out.dim_b[0]) == (0, 1)
    # dot(0,1) = 1e4*1e4 + 2e4*2e4 = 5e8
    assert out.dot_e8[0] == 500_000_000
    # dot(0,2) = 1e4*0.5e4 + 2e4*(-1e4) = -1.5e8
    got = {(a, b): v for a, b, v in zip(out.dim_a, out.dim_b,
                                        out.dot_e8)}
    assert got[(0, 2)] == -150_000_000


def test_bfs_distances(ray_session, tmp_path):
    from ctdray.pipelines.analytics import part_graph_bfs
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "p_name": pa.array(["a"] * 6),
    }), str(tmp_path / "part.parquet"))
    # orders: (1,2) (2,3) (3,4) chain; (5,6) disconnected
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10, 11, 11, 12, 12, 13, 13],
                               pa.int64()),
        "l_partkey": pa.array([1, 2, 2, 3, 3, 4, 5, 6], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = part_graph_bfs(str(tmp_path), max_depth=3).to_pandas()
    got = dict(zip(out.part_id, out.dist))
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_ngram_novelty(ray_session, tmp_path):
    from ctdray.pipelines.analytics import ngram_novelty_ratio
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        # doc0 grams: "a b c", "b c d"; doc1 grams: "a b c", "b c x"
        # df: "a b c"->2, others->1
        "text": pa.array(["a b c d", "a b c x"]),
    }), str(tmp_path / "documents.parquet"))
    out = ngram_novelty_ratio(str(tmp_path)).to_pandas() \
        .set_index("doc_id").sort_index()
    assert list(out.n_grams) == [2, 2]
    assert list(out.n_unique_grams) == [1, 1]

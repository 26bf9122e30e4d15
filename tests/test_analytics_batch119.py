"""Batch 119: adjacent embedding dots, hub common neighbors, subset
containment, alphabet census."""
import pyarrow as pa
import pyarrow.parquet as pq


def test_embedding_adjacent_dot_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import embedding_adjacent_dot_hist
    # dots: (0,1) = 1000*2000 = 2e6 (bit length 21);
    # (1,2) = 2000*(-1000) = -2e6
    pq.write_table(pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [2.0, 0.0], [-1.0, 0.0]],
                              pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))
    out = embedding_adjacent_dot_hist(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(-1, 21, 1), (1, 21, 1)]


def test_coorder_hub_common_neighbors(ray_session, tmp_path):
    from ctdray.pipelines.analytics import coorder_hub_common_neighbors
    # triangle 1-2-3 plus pendant edge 1-4
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10, 10, 20, 20], pa.int64()),
        "l_partkey": pa.array([1, 2, 3, 1, 4], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = coorder_hub_common_neighbors(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (1, 2, 1), (1, 3, 1), (1, 4, 0),
        (2, 3, 1), (2, 4, 1), (3, 4, 1)]


def test_order_subset_containment(ray_session, tmp_path):
    from ctdray.pipelines.analytics import order_subset_containment
    # order 1 {1,2} is contained in order 2 {1,2,3}; order 3 {5}
    # shares nothing; a duplicate part line must not inflate sizes
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 1, 2, 2, 2, 3], pa.int64()),
        "l_partkey": pa.array([1, 2, 2, 1, 2, 3, 5], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = order_subset_containment(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(2, 1)]


def test_doc_alphabet_size_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import doc_alphabet_size_hist
    # "ab ab" has chars {a, b, space} = 3; "aaaa" has 1
    pq.write_table(pa.table({
        "text": pa.array(["ab ab", "aaaa"]),
    }), str(tmp_path / "documents.parquet"))
    out = doc_alphabet_size_hist(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(1, 1), (3, 1)]

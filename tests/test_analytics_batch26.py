"""Batch 26: triangle counting, vocabulary growth, intra-doc repetition
positions, interval concurrency sweep."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_triangles_square_plus_diagonal(ray_session, tmp_path):
    from ctdray.pipelines.analytics import part_triangle_count
    # orders create edges: (1,2),(2,3),(3,4),(1,4),(1,3) ->
    # triangles {1,2,3} and {1,3,4}
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10, 11, 11, 12, 12, 13, 13, 14, 14],
                               pa.int64()),
        "l_partkey": pa.array([1, 2, 2, 3, 3, 4, 1, 4, 1, 3],
                              pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = part_triangle_count(str(tmp_path)).to_pandas()
    assert out.n_edges[0] == 5
    assert out.n_triangles[0] == 2


def test_first_seen_buckets(ray_session, tmp_path):
    from ctdray.pipelines.analytics import token_first_seen_hist
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 64, 128], pa.int64()),
        # "a" first in doc 0; "b" first in doc 64; "c" first in 128;
        # repeats don't count
        "text": pa.array(["a a", "a b", "b c"]),
    }), str(tmp_path / "documents.parquet"))
    out = token_first_seen_hist(str(tmp_path)).to_pandas()
    got = dict(zip(out.doc_bucket, out.n_new_tokens))
    assert got == {0: 1, 1: 1, 2: 1}


def test_intra_repeat_positions(ray_session, tmp_path):
    from ctdray.pipelines.analytics import doc_intra_repeat_positions
    rep = " ".join(["a b c d e f g h"] * 2)      # 16 tokens, 9 positions
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        # doc 0: position 8 repeats position 0's chunk -> 1 repeat
        # doc 1: too short (7 tokens) -> excluded
        "text": pa.array([rep, "a b c d e f g"]),
    }), str(tmp_path / "documents.parquet"))
    out = doc_intra_repeat_positions(str(tmp_path)).to_pandas()
    assert list(out.doc_id) == [0]
    assert out.n_positions[0] == 9
    assert out.n_repeat_positions[0] == 1


def test_open_orders_sweep(ray_session, tmp_path):
    from ctdray.pipelines.analytics import orders_open_per_day
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array([_ts("1995-01-01"), _ts("1995-01-10")],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    out = orders_open_per_day(str(tmp_path), open_days=30).to_pandas()
    got = dict(zip(out.day.values, out.n_open))
    assert got[np.datetime64("1995-01-01", "us")] == 1
    assert got[np.datetime64("1995-01-10", "us")] == 2   # both open
    assert got[np.datetime64("1995-01-31", "us")] == 1   # first closed at +30
    assert np.datetime64("1995-02-09", "us") not in got  # second closed
    assert out.n_open.max() == 2 and len(out) == 39

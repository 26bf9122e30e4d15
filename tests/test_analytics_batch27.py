"""Batch 27: kNN label voting, burst windows, repeat purchases, dup
cluster sizes."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_knn_vote_majority(ray_session, tmp_path):
    from ctdray.pipelines.analytics import knn_label_vote
    # two tight clusters in 2 of 4 dims; k=5 forces cross-cluster picks
    # for the smaller cluster
    vecs = [[1.0, 0.9, 0.0, 0.0], [0.9, 1.0, 0.0, 0.0],
            [1.0, 1.0, 0.1, 0.0], [0.0, 0.0, 1.0, 0.9],
            [0.0, 0.1, 0.9, 1.0], [0.1, 0.0, 1.0, 1.0],
            [0.0, 0.0, 0.9, 0.95], [1.0, 0.95, 0.05, 0.0]]
    labels = [0, 0, 0, 1, 1, 1, 1, 0]
    pq.write_table(pa.table({
        "vec_id": pa.array(range(8), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))
    out = knn_label_vote(str(tmp_path), k=3).to_pandas()
    got = {(t, p): n for t, p, n in zip(out.true_label,
                                        out.pred_label, out.n)}
    # k=3 within-cluster neighbours dominate -> perfect diagonal
    assert got == {(0, 0): 4, (1, 1): 4}


def test_burst_two_pointer(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_burst_max_5min
    pq.write_table(pa.table({
        "event_id": pa.array(range(4), pa.int64()),
        # 3 events within 5 min; 1 far later
        "ts": pa.array([_ts("2024-01-01T00:00:00"),
                        _ts("2024-01-01T00:02:00"),
                        _ts("2024-01-01T00:05:00"),
                        _ts("2024-01-01T03:00:00")],
                       pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "event_type": pa.array(["x"] * 4),
        "value": pa.array([0.0] * 4),
    }), str(tmp_path / "events.parquet"))
    out = user_burst_max_5min(str(tmp_path)).to_pandas()
    assert out.max_burst[0] == 3 and out.n_events[0] == 4


def test_repeat_purchases(ray_session, tmp_path):
    from ctdray.pipelines.analytics import repeat_purchase_stats
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([7, 7, 8], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        # cust 7 buys part 100 in orders 1 AND 2 (repeat);
        # part 200 once; cust 8 part 100 once
        "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_partkey": pa.array([100, 200, 100, 100], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = repeat_purchase_stats(str(tmp_path)).to_pandas()
    assert (out.n_pairs[0], out.n_repeat_pairs[0],
            out.max_repeats[0]) == (3, 1, 2)


def test_cluster_size_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import dup_cluster_size_hist
    pq.write_table(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(["x", "x", "x", "y", "z"]),
    }), str(tmp_path / "documents.parquet"))
    out = dup_cluster_size_hist(str(tmp_path)).to_pandas()
    got = dict(zip(out.cluster_size, out.n_clusters))
    assert got == {3: 1, 1: 2}

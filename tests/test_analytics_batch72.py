"""Batch 72: KMV sketch intersection, position diversity, clustering
coefficient, early value share."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_kmv_intersection_estimate_exact_mode(ray_session, tmp_path):
    from ctdray.pipelines.analytics import kmv_intersection_estimate
    # tiny sets -> sketch unsaturated -> estimate IS exact
    rows = [("view", 1), ("view", 2), ("view", 3),
            ("purchase", 2), ("purchase", 3), ("purchase", 4)]
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_ts("2024-01-01")] * len(rows),
                       pa.timestamp("us")),
        "user_id": pa.array([u for _, u in rows], pa.int64()),
        "event_type": pa.array([t for t, _ in rows]),
        "value": pa.array([0.0] * len(rows)),
    }), str(tmp_path / "events.parquet"))
    out = kmv_intersection_estimate(str(tmp_path)).to_pandas()
    assert out.exact_intersection[0] == 2
    assert out.est_intersection[0] == 2


def test_token_position_diversity(ray_session, tmp_path):
    from ctdray.pipelines.analytics import token_position_diversity
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        # position 0: {the} ; position 1: {cat, dog}
        "text": pa.array(["the cat", "the dog"]),
    }), str(tmp_path / "documents.parquet"))
    out = token_position_diversity(str(tmp_path)).to_pandas() \
        .set_index("pos").sort_index()
    assert out.loc[0].n_distinct_tokens == 1
    assert out.loc[1].n_distinct_tokens == 2


def test_coorder_clustering_coefficient(ray_session, tmp_path):
    from ctdray.pipelines.analytics import (
        coorder_clustering_coefficient)
    # order 1 = {1,2,3} (triangle); order 2 = {3,4} (pendant edge)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "l_partkey": pa.array([1, 2, 3, 3, 4], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = coorder_clustering_coefficient(str(tmp_path)).to_pandas()
    assert out.n_triangles[0] == 1
    # degrees: 1:2, 2:2, 3:3, 4:1 -> paths2 = 1+1+3+0 = 5
    assert out.n_paths2[0] == 5
    assert out.clustering_ppm[0] == 600_000


def test_early_value_share_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import early_value_share_hist
    # user 1: day0 value 3.00, day30 value 1.00 -> early 75% -> bucket 7
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "ts": pa.array([_ts("2024-01-01"), _ts("2024-01-31")],
                       pa.timestamp("us")),
        "user_id": pa.array([1, 1], pa.int64()),
        "event_type": pa.array(["x"] * 2),
        "value": pa.array([3.0, 1.0]),
    }), str(tmp_path / "events.parquet"))
    out = early_value_share_hist(str(tmp_path)).to_pandas()
    assert list(out.bucket) == [7]
    assert list(out.n_users) == [1]

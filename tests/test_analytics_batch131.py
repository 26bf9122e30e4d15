"""Batch 131: ART node types, uniform-pick bias, intersection cost,
sparse layout planner."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_art_node_type_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import art_node_type_census
    # keys 1..5 share prefix 0x000000 (leaf node with 5 children ->
    # Node16); 0x01000001 adds a second byte-0 branch
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5, 16_777_217],
                               pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    out = art_node_type_census(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (0, 4, 1), (1, 4, 2), (2, 4, 2), (3, 4, 1), (3, 16, 1)]


def test_per_group_uniform_pick_bias(ray_session, tmp_path):
    from ctdray.pipelines.analytics import per_group_uniform_pick_bias
    # md5(1) < md5(2): customer 1 picks order 1 ('A'); customer 2
    # picks its only order ('B')
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderpriority": pa.array(["A", "B", "B"]),
    }), str(tmp_path / "orders.parquet"))
    out = per_group_uniform_pick_bias(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        ("A", 1, 1, 1, 500_000), ("B", 2, 1, -1, 250_000)]


def test_list_intersection_cost_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import list_intersection_cost_audit
    # x: 5 occurrences, docs {0,1,2}; y: 4 occurrences, docs {0,2,3}
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["x x y", "x", "x x y", "y y"]),
    }), str(tmp_path / "documents.parquet"))
    out = list_intersection_cost_audit(str(tmp_path)).to_pandas()
    # small = y-list; positions in x-list: 0,2,3 -> jumps 1,2,1 ->
    # gallop cost 2*(2+2+2) = 12
    assert list(map(tuple, out.values)) == [
        ("x", "y", 3, 3, 2, 6, 12)]


def test_sparse_layout_planner(ray_session, tmp_path):
    from ctdray.pipelines.analytics import sparse_layout_planner
    pq.write_table(pa.table({
        "ts": pa.array([_ts("1970-01-01"), _ts("1970-01-08"),
                        _ts("1970-01-02")], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 2], pa.int64()),
    }), str(tmp_path / "events.parquet"))
    out = sparse_layout_planner(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (2, 2, 3, 36, 36, 2, "bitmap")]

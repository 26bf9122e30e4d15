"""Batch 144: ts precision collisions, makespan audit, DRF shares,
edge block locality."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_ts_precision_collision_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import \
        ts_precision_collision_census
    t = [_ts("2024-01-01T00:00:00.000001"),
         _ts("2024-01-01T00:00:00.000002"),
         _ts("2024-01-01T00:00:00.001000"),
         _ts("2024-01-01T00:00:00.001000")]
    pq.write_table(pa.table({
        "ts": pa.array(t, pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = ts_precision_collision_census(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        ("us", 3, 1), ("ms", 2, 2), ("s", 1, 3)]


def test_task_assignment_makespan_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import \
        task_assignment_makespan_audit
    keys = [1] * 4 + [2] + [3] * 2
    pq.write_table(pa.table({
        "l_suppkey": pa.array(keys, pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = task_assignment_makespan_audit(str(tmp_path)).to_pandas()
    # rr spreads 4/1/2; md5 lands s1,s3 on worker 4 -> makespan 6
    assert list(map(tuple, out.values)) == [
        ("round_robin", 8, 7, 4, 218750),
        ("md5_hash", 8, 7, 6, 145833)]


def test_drf_dominant_share_top5(ray_session, tmp_path):
    from ctdray.pipelines.analytics import drf_dominant_share_top5
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
        "o_totalprice": pa.array([1.0, 1.0, 1.0, 7.0]),
    }), str(tmp_path / "orders.parquet"))
    out = drf_dominant_share_top5(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (1, 750000, 300000, 750000), (2, 250000, 700000, 700000)]


def test_edge_block_locality_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import edge_block_locality_audit
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "l_partkey": pa.array([10, 20, 2000, 10, 20], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = edge_block_locality_audit(str(tmp_path)).to_pandas()
    # edges (10,20),(10,2000),(20,2000): range keeps 1, md5 keeps 1
    assert list(map(tuple, out.values)) == [
        ("partkey_range", 3, 1), ("md5_hash", 3, 1)]

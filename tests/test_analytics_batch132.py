"""Batch 132: FD strength, l-diversity, v-optimal split, M/M/1
backlog."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_fd_strength_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import fd_strength_census
    pq.write_table(pa.table({
        "p_brand": pa.array(["B1", "B1", "B2"]),
        "p_type": pa.array(["T1", "T2", "T1"]),
        "p_size": pa.array([1, 1, 2], pa.int32()),
    }), str(tmp_path / "part.parquet"))
    out = fd_strength_census(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        ("brand->size", 2, 0, 0), ("brand->type", 2, 1, 1),
        ("size->brand", 2, 0, 0), ("type->brand", 2, 1, 1)]


def test_ldiversity_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import ldiversity_audit
    pq.write_table(pa.table({
        "c_nationkey": pa.array([0, 0, 0, 1, 1, 1], pa.int64()),
        "c_mktsegment": pa.array(["A", "A", "B", "A", "A", "A"]),
        "c_acctbal": pa.array([1.00, -2.00, 1.00, 0.00, 3.00, 0.00]),
    }), str(tmp_path / "customer.parquet"))
    out = ldiversity_audit(str(tmp_path)).to_pandas()
    # (0,A) signs {+,-}; (0,B) {+}; (1,A) {0,+}
    assert list(map(tuple, out.values)) == [(1, 1, 1), (2, 2, 5)]


def test_voptimal_2bucket_split(ray_session, tmp_path):
    from ctdray.pipelines.analytics import voptimal_2bucket_split
    # values {1,2,10}: split 2 isolates 10 -> scaled err 500000
    pq.write_table(pa.table({
        "l_quantity": pa.array([1.0, 2.0, 10.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = voptimal_2bucket_split(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(2, "500000", 2, 1)]


def test_mm1_backlog_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import mm1_backlog_audit
    # arrivals 5,0,1 over 3 grid days; c = 2 -> q = 3,1,0
    ts = [_ts("2024-01-01T00:00")] * 5 + [_ts("2024-01-03T00:00")]
    pq.write_table(pa.table({
        "ts": pa.array(ts, pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = mm1_backlog_audit(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (2, 3, np.datetime64("2024-01-01", "us"), 2, 3)]

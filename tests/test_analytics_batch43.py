"""Batch 43: per-source dup stats, hour-of-day bitmask, part-name
collisions."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_source_dup_stats(ray_session, tmp_path):
    from ctdray.pipelines.analytics import source_dup_stats
    pq.write_table(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        # s1: "x","x","y" -> 3 docs, 2 unique -> 333333 ppm dup
        # s2: "z" -> clean
        "text": pa.array(["x", "x", "y", "z"]),
        "source": pa.array(["s1", "s1", "s1", "s2"]),
    }), str(tmp_path / "documents.parquet"))
    out = source_dup_stats(str(tmp_path)).to_pandas() \
        .set_index("source").sort_index()
    assert list(out.n_docs) == [3, 1]
    assert list(out.n_unique) == [2, 1]
    assert list(out.dup_ratio_ppm) == [333_333, 0]


def test_hour_bitmask(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_hour_bitmask
    pq.write_table(pa.table({
        "event_id": pa.array(range(3), pa.int64()),
        # hours 0, 0, 5 -> mask = 1 + 32, n = 2
        "ts": pa.array([_ts("2024-01-01T00:10"), _ts("2024-01-02T00:20"),
                        _ts("2024-01-01T05:00")], pa.timestamp("us")),
        "user_id": pa.array([7, 7, 7], pa.int64()),
        "event_type": pa.array(["x"] * 3),
        "value": pa.array([0.0] * 3),
    }), str(tmp_path / "events.parquet"))
    out = user_hour_bitmask(str(tmp_path)).to_pandas()
    assert out.hour_mask[0] == (1 << 0) + (1 << 5)
    assert out.n_active_hours[0] == 2


def test_name_collisions(ray_session, tmp_path):
    from ctdray.pipelines.analytics import part_name_collisions
    pq.write_table(pa.table({
        "p_partkey": pa.array(range(4), pa.int64()),
        "p_name": pa.array(["bolt", "bolt", "nut", "bolt"]),
        "p_brand": pa.array(["B1", "B2", "B1", "B1"]),
    }), str(tmp_path / "part.parquet"))
    out = part_name_collisions(str(tmp_path)).to_pandas()
    assert list(out.p_name) == ["bolt"]
    assert list(out.n_brands) == [2]

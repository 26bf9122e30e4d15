"""Batch 146: AIMD replay, day-boundary shifts, anisotropy,
top-value concentration."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_aimd_congestion_replay(ray_session, tmp_path):
    from ctdray.pipelines.analytics import aimd_congestion_replay
    dates = [_ts("2024-01-01T00:00")] * 2 \
        + [_ts("2024-01-02T00:00")] * 10
    pq.write_table(pa.table({
        "o_orderdate": pa.array(dates + [_ts("2024-01-03T00:00")],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    # demands [2,10,1]: 4->5, loss->2, ->3
    out = aimd_congestion_replay(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(3, 1, 3, 5)]


def test_day_boundary_shift_sensitivity(ray_session, tmp_path):
    from ctdray.pipelines.analytics import \
        day_boundary_shift_sensitivity
    pq.write_table(pa.table({
        "ts": pa.array([_ts("2024-01-01T23:00"),
                        _ts("2024-01-02T01:00")],
                       pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = day_boundary_shift_sensitivity(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (0, 2, 1), (6, 1, 2), (12, 1, 2), (18, 1, 2)]


def test_embedding_anisotropy_ppm(ray_session, tmp_path):
    from ctdray.pipelines.analytics import embedding_anisotropy_ppm
    emb = [[0.001, 0.002], [0.003, -0.002]]
    pq.write_table(pa.table({
        "embedding": pa.array(emb, pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))
    out = embedding_anisotropy_ppm(str(tmp_path)).to_pandas()
    # S=[4,0] -> 16; m2=18; 16e6//36
    assert list(map(tuple, out.values)) == [(2, 16, 18, 444444)]


def test_top_value_event_day_concentration(ray_session, tmp_path):
    from ctdray.pipelines.analytics import \
        top_value_event_day_concentration
    pq.write_table(pa.table({
        "ts": pa.array([_ts("2024-01-01T00:00"),
                        _ts("2024-01-01T01:00"),
                        _ts("2024-01-02T00:00")],
                       pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "value": pa.array([1.0, 2.0, 3.0]),
    }), str(tmp_path / "events.parquet"))
    out = top_value_event_day_concentration(str(tmp_path)) \
        .to_pandas()
    assert list(map(tuple, out.values)) == [(3, 2, 2, 666666)]

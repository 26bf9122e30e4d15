"""Batch 71: BPE overhead, centroid distances, density, salted
top-user."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_bpe_overhead_by_lang(ray_session, tmp_path):
    from ctdray.pipelines.analytics import bpe_overhead_by_lang
    # "ab3 x" -> bpe tokens: ab, 3, x = 3; ws tokens = 2
    pq.write_table(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["ab3 x"]),
        "lang": pa.array(["en"]),
    }), str(tmp_path / "documents.parquet"))
    out = bpe_overhead_by_lang(str(tmp_path)).to_pandas()
    assert out.n_bpe[0] == 3
    assert out.n_ws[0] == 2
    assert out.overhead_ppm[0] == 1_500_000


def test_label_centroid_distance_matrix(ray_session, tmp_path):
    from ctdray.pipelines.analytics import (
        label_centroid_distance_matrix)
    vecs = np.zeros((3, 64), dtype=np.float32)
    vecs[0, 0] = 0.1   # label 0 centroid dim0 = 1000
    vecs[1, 0] = 0.3   # label 1: two vecs, centroid dim0 = 2500
    vecs[2, 0] = 0.2
    pq.write_table(pa.table({
        "vec_id": pa.array(range(3), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array([0, 1, 1], pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))
    out = label_centroid_distance_matrix(str(tmp_path)).to_pandas()
    assert len(out) == 1
    # num = (n_b*S_a - n_a*S_b)^2 = (2*1000 - 1*5000)^2 = 9e6
    assert out.d2_num[0] == 9_000_000.0
    assert out.n_a[0] == 1 and out.n_b[0] == 2


def test_user_day_density_ppm(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_day_density_ppm
    # grid 2 users x 2 days, 3 cells filled -> 750000 ppm
    rows = [(1, "2024-01-01"), (1, "2024-01-02"), (2, "2024-01-01"),
            (1, "2024-01-01")]
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_ts(d + "T01:00") for _, d in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "event_type": pa.array(["x"] * len(rows)),
        "value": pa.array([0.0] * len(rows)),
    }), str(tmp_path / "events.parquet"))
    out = user_day_density_ppm(str(tmp_path)).to_pandas()
    assert out.n_user_days[0] == 3
    assert out.density_ppm[0] == 750_000


def test_salted_top_user(ray_session, tmp_path):
    from ctdray.pipelines.analytics import salted_top_user
    pq.write_table(pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "user_id": pa.array([7, 7, 7, 8, 8], pa.int64()),
    }), str(tmp_path / "events.parquet"))
    out = salted_top_user(str(tmp_path)).to_pandas()
    assert list(out.user_id) == [7]
    assert list(out.n_events) == [3]

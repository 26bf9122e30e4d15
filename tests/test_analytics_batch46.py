"""Batch 46: pretraining composite chain, Gini impurity, global gap
median via selection, inversion counting."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_pretrain_pipeline_docs(ray_session, tmp_path):
    from ctdray.pipelines.analytics import pretrain_pipeline_docs
    good = " ".join(["tok"] * 20)           # passes quality band
    # md5('27') and md5('59') start with '0' (pass the 1/16 sample);
    # md5('61') does not (dropped by the sample).
    pq.write_table(pa.table({
        # docs 27 and 99 share text -> dedup keeps 27, which samples in;
        # doc 59 is too short (quality drop); doc 61 passes quality but
        # samples out.
        "doc_id": pa.array([27, 99, 59, 61], pa.int64()),
        "text": pa.array([good, good, "short", good + " extra"]),
    }), str(tmp_path / "documents.parquet"))
    out = pretrain_pipeline_docs(str(tmp_path)).to_pandas()
    assert set(out.doc_id) == {27}


def test_user_type_gini_ppm(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_type_gini_ppm
    pq.write_table(pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "ts": pa.array([_ts("2024-01-01")] * 5, pa.timestamp("us")),
        # u1: 2 a, 2 b -> 1 - 8/16 -> 500000; u2: 1 type -> 0
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "event_type": pa.array(["a", "a", "b", "b", "x"]),
        "value": pa.array([0.0] * 5),
    }), str(tmp_path / "events.parquet"))
    out = user_type_gini_ppm(str(tmp_path)).to_pandas() \
        .set_index("user_id").sort_index()
    assert out.loc[1].gini_ppm == 500_000
    assert out.loc[2].gini_ppm == 0
    assert out.loc[1].n_events == 4


def test_global_gap_median_us(ray_session, tmp_path):
    from ctdray.pipelines.analytics import global_gap_median_us
    # u1 gaps: 10s, 30s ; u2 gap: 20s -> median 20s
    pq.write_table(pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "ts": pa.array([_ts("2024-01-01T00:00:00"),
                        _ts("2024-01-01T00:00:10"),
                        _ts("2024-01-01T00:00:40"),
                        _ts("2024-01-01T01:00:00"),
                        _ts("2024-01-01T01:00:20")], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "event_type": pa.array(["x"] * 5),
        "value": pa.array([0.0] * 5),
    }), str(tmp_path / "events.parquet"))
    out = global_gap_median_us(str(tmp_path)).to_pandas()
    assert list(out.q) == [0.5]
    assert list(out.value) == [20_000_000.0]


def test_count_inversions_matches_bruteforce():
    from ctdray.pipelines.analytics import _count_inversions
    rng = np.random.default_rng(7)
    for n in (0, 1, 5, 63, 64, 65, 200, 1000):
        a = rng.permutation(n).astype(np.int64)
        brute = int(np.sum(np.triu(a[:, None] > a[None, :], 1)))
        assert _count_inversions(a) == brute, n


def test_user_event_id_inversions(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_event_id_inversions
    # ts order: e5, e2, e9 -> eid sequence [5,2,9] -> 1 inversion
    pq.write_table(pa.table({
        "event_id": pa.array([5, 2, 9], pa.int64()),
        "ts": pa.array([_ts("2024-01-01T00:00"), _ts("2024-01-01T01:00"),
                        _ts("2024-01-01T02:00")], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "event_type": pa.array(["x"] * 3),
        "value": pa.array([0.0] * 3),
    }), str(tmp_path / "events.parquet"))
    out = user_event_id_inversions(str(tmp_path)).to_pandas()
    assert out.n_inversions[0] == 1
    assert out.n_events[0] == 3

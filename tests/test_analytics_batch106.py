"""Batch 106: Count-Min sketch audit, largest-remainder quotas,
varint delta audit, error-burst hours."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_countmin_sketch_estimates(ray_session, tmp_path):
    from ctdray.pipelines.analytics import countmin_sketch_estimates
    # width=1: every token collides into the single cell of each row,
    # so n_est = total token count for every token
    pq.write_table(pa.table({
        "text": pa.array(["a b a", "c"]),
    }), str(tmp_path / "documents.parquet"))
    out = countmin_sketch_estimates(str(tmp_path), width=1).to_pandas()
    assert out.token.tolist() == ["a", "b", "c"]
    assert out.n_true.tolist() == [2, 1, 1]
    assert out.n_est.tolist() == [4, 4, 4]


def test_countmin_estimate_never_underestimates(ray_session, tmp_path):
    from ctdray.pipelines.analytics import countmin_sketch_estimates
    rng = np.random.default_rng(3)
    words = ["w%d" % i for i in range(40)]
    texts = [" ".join(rng.choice(words, size=30)) for _ in range(30)]
    pq.write_table(pa.table({"text": pa.array(texts)}),
                   str(tmp_path / "documents.parquet"))
    out = countmin_sketch_estimates(str(tmp_path), width=8).to_pandas()
    assert (out.n_est >= out.n_true).all()
    assert (out.n_est > out.n_true).any()  # collisions at w=8, 40 toks


def test_sample_quota_largest_remainder(ray_session, tmp_path):
    from ctdray.pipelines.analytics import sample_quota_largest_remainder
    # counts 1,1,1 with budget 10: floors 3,3,3; remainders equal ->
    # lang ASC tie-break gives the extra to "aa"
    pq.write_table(pa.table({
        "lang": pa.array(["aa", "bb", "cc"]),
    }), str(tmp_path / "documents.parquet"))
    out = sample_quota_largest_remainder(str(tmp_path),
                                         budget=10).to_pandas()
    assert out.lang.tolist() == ["aa", "bb", "cc"]
    assert out.quota.tolist() == [4, 3, 3]
    assert out.quota.sum() == 10


def test_timestamp_delta_varint_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import timestamp_delta_varint_audit
    # user 1: ts at +0us, +0us (dup), +100us, +1e9us ->
    # deltas 0 (1 byte), 100 (1 byte), 999999900 (5 bytes: < 128^5)
    ts = pa.array([_ts("2024-01-01T00:00:00"),
                   _ts("2024-01-01T00:00:00"),
                   np.datetime64("2024-01-01T00:00:00", "us").item()
                   + __import__("datetime").timedelta(microseconds=100),
                   _ts("2024-01-01T00:16:40")], pa.timestamp("us"))
    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "ts": ts,
    }), str(tmp_path / "events.parquet"))
    out = timestamp_delta_varint_audit(str(tmp_path)).to_pandas()
    assert out.n_deltas[0] == 3
    assert out.n_zero_deltas[0] == 1
    # 999999900 < 128^5=34359738368 and >= 128^4 -> 5 bytes
    assert out.delta_bytes[0] == 1 + 1 + 5


def test_error_burst_hour_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import error_burst_hour_hist
    # user 1: errors at 10:00, 12:00, 14:00 same day -> each has 2
    # others within 24h -> all bursty; duplicate instant collapses;
    # lone error 10 days later has only 0 nearby -> not bursty
    ts = pa.array([_ts("2024-01-01T10:00:00"),
                   _ts("2024-01-01T10:00:00"),
                   _ts("2024-01-01T12:00:00"),
                   _ts("2024-01-01T14:00:00"),
                   _ts("2024-01-11T15:00:00")], pa.timestamp("us"))
    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 1, 1, 1], pa.int64()),
        "event_type": pa.array(["error"] * 5),
        "ts": ts,
    }), str(tmp_path / "events.parquet"))
    out = error_burst_hour_hist(str(tmp_path)).to_pandas()
    assert dict(zip(out.hour, out.n_bursty)) == {10: 1, 12: 1, 14: 1}

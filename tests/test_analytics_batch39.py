"""Batch 39: last-digit uniformity, resurrection counts, first-token
distribution."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_last_digit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import price_last_digit_hist
    pq.write_table(pa.table({
        # cents: 123, 120, 5003 -> digits 3, 0, 3
        "l_extendedprice": pa.array([1.23, 1.20, 50.03]),
    }), str(tmp_path / "lineitem.parquet"))
    out = price_last_digit_hist(str(tmp_path)).to_pandas()
    got = dict(zip(out.last_digit, out.n))
    assert got == {3: 2, 0: 1}


def test_resurrections(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_resurrection_counts
    pq.write_table(pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        # u1: days 1, 2, 15 -> one gap > 7 -> 1 resurrection
        # u2: day 1 only -> 0
        "ts": pa.array([_ts("2024-01-01"), _ts("2024-01-02"),
                        _ts("2024-01-15"), _ts("2024-01-15T01:00"),
                        _ts("2024-01-01T05:00")], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "event_type": pa.array(["x"] * 5),
        "value": pa.array([0.0] * 5),
    }), str(tmp_path / "events.parquet"))
    out = user_resurrection_counts(str(tmp_path)).to_pandas()
    got = dict(zip(out.n_resurrections, out.n_users))
    assert got == {1: 1, 0: 1}


def test_first_token(ray_session, tmp_path):
    from ctdray.pipelines.analytics import doc_first_token_dist
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["hello world", "hello there", "bye now"]),
    }), str(tmp_path / "documents.parquet"))
    out = doc_first_token_dist(str(tmp_path)).to_pandas()
    got = dict(zip(out.first_token, out.n_docs))
    assert got == {"hello": 2, "bye": 1}

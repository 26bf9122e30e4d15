"""Batch 92: multigrain distinct users, user modal-type churn matrix,
embedding label inertia moments, weekday value share."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def _events(tmp_path, ts, users, types, values=None):
    n = len(ts)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(types),
        "value": pa.array(values or [0.0] * n),
    }), str(tmp_path / "events.parquet"))


def test_distinct_users_multigrain(ray_session, tmp_path):
    from ctdray.pipelines.analytics import distinct_users_multigrain
    # Mon 2024-01-01 and Tue 2024-01-02 (same ISO week/month):
    # day1 users {1,2}, day2 users {1}; week users {1,2}; month {1,2}
    _events(tmp_path,
            [_ts("2024-01-01T05:00"), _ts("2024-01-01T06:00"),
             _ts("2024-01-02T05:00")],
            [1, 2, 1], ["a", "a", "a"])
    out = distinct_users_multigrain(str(tmp_path)).to_pandas()
    rows = {(r.grain, str(r.bucket)): r.n_users for r in out.itertuples()}
    assert rows[("day", "2024-01-01 00:00:00")] == 2
    assert rows[("day", "2024-01-02 00:00:00")] == 1
    assert rows[("week", "2024-01-01 00:00:00")] == 2
    assert rows[("month", "2024-01-01 00:00:00")] == 2


def test_user_modal_type_churn(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_modal_type_churn
    # user 1: before modal a (2xa 1xb), after modal b -> (a, b)
    # user 2: only before -> excluded
    _events(tmp_path,
            [_ts("2024-01-01T00:00"), _ts("2024-01-02T00:00"),
             _ts("2024-01-03T00:00"), _ts("2024-01-20T00:00"),
             _ts("2024-01-05T00:00")],
            [1, 1, 1, 1, 2], ["a", "a", "b", "b", "a"])
    out = user_modal_type_churn(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert (out.before_type[0], out.after_type[0]) == ("a", "b")
    assert out.n_users[0] == 1


def test_label_inertia_moments(ray_session, tmp_path):
    from ctdray.pipelines.analytics import label_inertia_moments
    # label X: q rows (10000, 0) and (0, 10000):
    #   sumsq = 2e8, csq = 1e8 + 1e8 = 2e8 -> inertia = 2*2e8 - 2e8
    pq.write_table(pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]],
                              pa.list_(pa.float32())),
        "label": pa.array(["X", "X", "Y"]),
    }), str(tmp_path / "embeddings.parquet"))
    out = label_inertia_moments(str(tmp_path)).to_pandas() \
        .set_index("label")
    assert out.loc["X"].n_vectors == 2
    assert out.loc["X"].inertia_num == str(2 * 200_000_000
                                           - 200_000_000)
    assert out.loc["Y"].n_vectors == 1
    assert out.loc["Y"].inertia_num == "0"


def test_event_dow_value_share(ray_session, tmp_path):
    from ctdray.pipelines.analytics import event_dow_value_share
    # Mon (2024-01-01): 1.0 + 2.0 = 300c; Tue: 1.0 = 100c
    _events(tmp_path,
            [_ts("2024-01-01T05:00"), _ts("2024-01-01T06:00"),
             _ts("2024-01-02T05:00")],
            [1, 1, 1], ["a", "a", "a"], [1.0, 2.0, 1.0])
    out = event_dow_value_share(str(tmp_path)).to_pandas() \
        .set_index("isodow")
    assert out.loc[1].n_events == 2
    assert out.loc[1].value_cents == 300
    assert out.loc[1].value_share_ppm == 750_000
    assert out.loc[2].value_share_ppm == 250_000

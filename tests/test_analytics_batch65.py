"""Batch 65: lang run count, ship atomicity, attribution models,
cumulative unique users."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_corpus_lang_run_count(ray_session, tmp_path):
    from ctdray.pipelines.analytics import corpus_lang_run_count
    # id order langs: en en de en -> 3 runs
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["x"] * 4),
        "lang": pa.array(["en", "en", "de", "en"]),
    }), str(tmp_path / "documents.parquet"))
    out = corpus_lang_run_count(str(tmp_path)).to_pandas()
    assert out.n_docs[0] == 4
    assert out.n_adjacent_pairs[0] == 3
    assert out.n_runs[0] == 3


def test_order_ship_atomicity(ray_session, tmp_path):
    from ctdray.pipelines.analytics import order_ship_atomicity
    pq.write_table(pa.table({
        # order 1: 2 lines same day (atomic); order 2: 2 lines split;
        # order 3: single line (not multi)
        "l_orderkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "l_shipdate": pa.array([_ts("2024-01-01T03:00"),
                                _ts("2024-01-01T20:00"),
                                _ts("2024-01-01"), _ts("2024-01-05"),
                                _ts("2024-02-01")], pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = order_ship_atomicity(str(tmp_path)).to_pandas()
    assert out.n_multi[0] == 2
    assert out.n_atomic[0] == 1
    assert out.atomic_ppm[0] == 500_000


def test_purchase_attribution_models(ray_session, tmp_path):
    from ctdray.pipelines.analytics import purchase_attribution_models
    # stream: view(t0), click(t1), purchase 5.00 (t2)
    # first touch = view, last touch = click
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([_ts("2024-01-01T10:00"), _ts("2024-01-01T11:00"),
                        _ts("2024-01-01T12:00")], pa.timestamp("us")),
        "user_id": pa.array([1] * 3, pa.int64()),
        "event_type": pa.array(["view", "click", "purchase"]),
        "value": pa.array([0.0, 0.0, 5.0]),
    }), str(tmp_path / "events.parquet"))
    out = purchase_attribution_models(str(tmp_path)).to_pandas() \
        .set_index("event_type")
    assert out.loc["view"].first_touch_cents == 500
    assert out.loc["view"].last_touch_cents == 0
    assert out.loc["click"].last_touch_cents == 500
    assert out.loc["click"].first_touch_cents == 0


def test_cumulative_unique_users(ray_session, tmp_path):
    from ctdray.pipelines.analytics import cumulative_unique_users
    # day1: users 1,2 first seen; day2: user 1 again + user 3 new
    rows = [(1, "2024-01-01"), (2, "2024-01-01"),
            (1, "2024-01-02"), (3, "2024-01-02")]
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_ts(d + "T01:00") for _, d in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "event_type": pa.array(["x"] * len(rows)),
        "value": pa.array([0.0] * len(rows)),
    }), str(tmp_path / "events.parquet"))
    out = cumulative_unique_users(str(tmp_path)).to_pandas() \
        .sort_values("day").reset_index(drop=True)
    assert list(out.n_new) == [2, 1]
    assert list(out.cum_users) == [2, 3]

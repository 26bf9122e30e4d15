"""Batch 77: duplicate-order suspects, monetization curve, bigram
holdout, error-churn matrix."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_duplicate_order_suspects(ray_session, tmp_path):
    from ctdray.pipelines.analytics import duplicate_order_suspects
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(4), pa.int64()),
        # two identical (cust, day, 50.00) rows + two distinct
        "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
        "o_orderdate": pa.array([_ts("1996-01-01")] * 3
                                + [_ts("1996-01-02")],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([50.0, 50.0, 60.0, 50.0]),
    }), str(tmp_path / "orders.parquet"))
    out = duplicate_order_suspects(str(tmp_path)).to_pandas()
    assert out.n_suspect_groups[0] == 1
    assert out.n_suspect_orders[0] == 2


def test_monetization_by_activity_decile(ray_session, tmp_path):
    from ctdray.pipelines.analytics import (
        monetization_by_activity_decile)
    # user 1: 4 events 2 purchases; user 2: 1 event 0 purchases
    rows = [(1, "purchase"), (1, "purchase"), (1, "view"), (1, "view"),
            (2, "view")]
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "event_type": pa.array([t for _, t in rows]),
    }), str(tmp_path / "events.parquet"))
    out = monetization_by_activity_decile(str(tmp_path)).to_pandas() \
        .set_index("decile").sort_index()
    # user2 rank 0 -> decile 0; user1 rank 1 -> decile 5
    assert out.loc[0].purchase_ppm == 0
    assert out.loc[5].purchase_ppm == 500_000


def test_bigram_holdout_coverage(ray_session, tmp_path):
    from ctdray.pipelines.analytics import bigram_holdout_coverage
    # doc 27 is test (md5 '0...'); doc 1 is train.
    # test bigrams: {a b, b c}; train has {a b} -> coverage 1/2
    pq.write_table(pa.table({
        "doc_id": pa.array([27, 1], pa.int64()),
        "text": pa.array(["a b c", "a b x"]),
    }), str(tmp_path / "documents.parquet"))
    out = bigram_holdout_coverage(str(tmp_path)).to_pandas()
    assert out.n_test_bigrams[0] == 2
    assert out.n_seen[0] == 1
    assert out.coverage_ppm[0] == 500_000


def test_error_rate_churn_matrix(ray_session, tmp_path):
    from ctdray.pipelines.analytics import error_rate_churn_matrix
    # user1: 1/2 errors, last event recent -> bucket 5, active
    # user2: 0 errors, last event old -> bucket 0, stale
    rows = [(1, "error", "2024-06-01"), (1, "view", "2024-06-02"),
            (2, "view", "2024-01-01")]
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_ts(d + "T00:00") for _, _t, d in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
        "event_type": pa.array([t for _, t, _ in rows]),
        "value": pa.array([0.0] * len(rows)),
    }), str(tmp_path / "events.parquet"))
    out = error_rate_churn_matrix(str(tmp_path)).to_pandas() \
        .set_index(["err_bucket", "status"])
    assert out.loc[(5, "active")].n_users == 1
    assert out.loc[(0, "stale")].n_users == 1

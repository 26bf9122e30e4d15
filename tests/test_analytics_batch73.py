"""Batch 73: recommender hit@k, rolling rank, hot-user skew, intra-doc
half Jaccard."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_popularity_rec_hit_at10(ray_session, tmp_path):
    from ctdray.pipelines.analytics import popularity_rec_hit_at10
    # cust 1 orders: o1 (train: part 5), o2 LAST (contains part 5: hit)
    # cust 2 orders: o3 (train: 5), o4 LAST (part 99 only: miss)
    # cust 3: single order o5 (excluded from eval, excluded from train)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "o_custkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "o_orderdate": pa.array([_ts("1996-01-01"), _ts("1996-02-01"),
                                 _ts("1996-01-01"), _ts("1996-02-01"),
                                 _ts("1996-01-01")], pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "l_partkey": pa.array([5, 5, 5, 99, 5], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = popularity_rec_hit_at10(str(tmp_path)).to_pandas()
    assert out.n_eval_customers[0] == 2
    assert out.n_hits[0] == 1
    assert out.hit_ppm[0] == 500_000


def test_order_rolling_rank_counts(ray_session, tmp_path):
    from ctdray.pipelines.analytics import order_rolling_rank_counts
    # values over time: 100, 50, 200 -> ranks 1, 2, 1
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([1, 1, 1], pa.int64()),
        "o_orderdate": pa.array([_ts("1996-01-01"), _ts("1996-02-01"),
                                 _ts("1996-03-01")], pa.timestamp("us")),
        "o_totalprice": pa.array([100.0, 50.0, 200.0]),
    }), str(tmp_path / "orders.parquet"))
    out = order_rolling_rank_counts(str(tmp_path)).to_pandas() \
        .set_index("rank").sort_index()
    assert out.loc[1].n_orders == 2
    assert out.loc[2].n_orders == 1


def test_hourly_hotuser_share_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import hourly_hotuser_share_hist
    # hour 0: user1 x3, user2 x1 -> share 750000 -> bucket 7
    # hour 1: user1 x1 -> share 1000000 -> bucket 10
    rows = [(1, 0), (1, 0), (1, 0), (2, 0), (1, 1)]
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_ts(f"2024-01-01T{h:02d}:00") for _, h in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "event_type": pa.array(["x"] * len(rows)),
        "value": pa.array([0.0] * len(rows)),
    }), str(tmp_path / "events.parquet"))
    out = hourly_hotuser_share_hist(str(tmp_path)).to_pandas() \
        .set_index("bucket").sort_index()
    assert out.loc[7].n_hours == 1
    assert out.loc[10].n_hours == 1


def test_doc_half_jaccard_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import doc_half_jaccard_hist
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        # doc0: halves {a,b} vs {a,b} -> jaccard 1.0 -> bucket 10
        # doc1: halves {a,b} vs {c,d} -> jaccard 0 -> bucket 0
        "text": pa.array(["a b a b", "a b c d"]),
    }), str(tmp_path / "documents.parquet"))
    out = doc_half_jaccard_hist(str(tmp_path)).to_pandas() \
        .set_index("bucket").sort_index()
    assert out.loc[0].n_docs == 1
    assert out.loc[10].n_docs == 1

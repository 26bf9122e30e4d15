"""Batch 87: nation-segment lift, customer part-diversity histogram,
user first/last event matrix, token document-frequency histogram."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_nation_segment_lift(ray_session, tmp_path):
    from ctdray.pipelines.analytics import nation_segment_lift
    # nation 0: 3xA 1xB; nation 1: 1xA 3xB  (N=8, A=4, B=4)
    pq.write_table(pa.table({
        "c_custkey": pa.array(range(8), pa.int64()),
        "c_nationkey": pa.array([0, 0, 0, 0, 1, 1, 1, 1], pa.int32()),
        "c_mktsegment": pa.array(["A", "A", "A", "B",
                                  "A", "B", "B", "B"]),
    }), str(tmp_path / "customer.parquet"))
    out = nation_segment_lift(str(tmp_path)).to_pandas()
    rows = {(r.c_nationkey, r.c_mktsegment): (r.n_customers, r.lift_ppm)
            for r in out.itertuples()}
    # lift(0,A) = 1e6*3*8 // (4*4) = 1_500_000
    assert rows[(0, "A")] == (3, 1_500_000)
    assert rows[(0, "B")] == (1, 500_000)
    assert rows[(1, "B")] == (3, 1_500_000)
    # output sorted by (nation, segment)
    assert list(out.c_nationkey) == sorted(out.c_nationkey)


def test_customer_part_diversity_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import customer_part_diversity_hist
    # cust 1: parts {10, 11} (11 twice) -> k=2; cust 2: {10} -> k=1
    pq.write_table(pa.table({
        "o_orderkey": pa.array([100, 101, 102], pa.int64()),
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([100, 100, 101, 102], pa.int64()),
        "l_partkey": pa.array([10, 11, 11, 10], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = customer_part_diversity_hist(str(tmp_path)).to_pandas() \
        .set_index("n_parts")
    assert out.loc[1].n_customers == 1
    assert out.loc[2].n_customers == 1
    assert len(out) == 2


def test_user_first_last_matrix(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_first_last_matrix
    # user 1: view .. purchase; user 2: view only; user 3: purchase..view
    pq.write_table(pa.table({
        "event_id": pa.array(range(6), pa.int64()),
        "ts": pa.array([_ts("2024-01-01T00:00"), _ts("2024-01-01T00:05"),
                        _ts("2024-01-01T01:00"),
                        _ts("2024-01-01T02:00"), _ts("2024-01-01T02:05"),
                        _ts("2024-01-01T02:10")], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 2, 3, 3, 3], pa.int64()),
        "event_type": pa.array(["view", "purchase", "view",
                                "purchase", "click", "view"]),
        "value": pa.array([0.0] * 6),
    }), str(tmp_path / "events.parquet"))
    out = user_first_last_matrix(str(tmp_path)).to_pandas()
    rows = {(r.first_type, r.last_type): r.n_users
            for r in out.itertuples()}
    assert rows == {("view", "purchase"): 1, ("view", "view"): 1,
                    ("purchase", "view"): 1}


def test_token_df_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import token_df_hist
    # "a" in 3 docs, "b" in 2, "c" in 1 (twice in the same doc = df 1)
    pq.write_table(pa.table({
        "doc_id": pa.array(["d1", "d2", "d3"]),
        "text": pa.array(["a b c c", "a b", "a"]),
    }), str(tmp_path / "documents.parquet"))
    out = token_df_hist(str(tmp_path)).to_pandas().set_index("df")
    assert out.loc[1].n_tokens == 1   # c
    assert out.loc[2].n_tokens == 1   # b
    assert out.loc[3].n_tokens == 1   # a
    assert list(out.index) == [1, 2, 3]

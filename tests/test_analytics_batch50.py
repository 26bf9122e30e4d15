"""Batch 50: dim variance, DAU overlap Jaccard, join-size estimate,
log2 histogram."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_embedding_dim_variance(ray_session, tmp_path):
    from ctdray.pipelines.analytics import embedding_dim_variance
    vecs = np.zeros((2, 64), dtype=np.float32)
    vecs[0, 0] = 0.1   # q = 1000
    vecs[1, 0] = 0.3   # q = 3000
    pq.write_table(pa.table({
        "vec_id": pa.array(range(2), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array([0, 0], pa.int32())}),
        str(tmp_path / "embeddings.parquet"))
    out = embedding_dim_variance(str(tmp_path)).to_pandas() \
        .set_index("dim")
    # n=2, sum=4000, sumsq=1e6+9e6 -> var_num = 2*1e7 - 16e6 = 4e6
    assert out.loc[0].sum_e4 == 4000
    assert out.loc[0].sumsq_e8 == 10_000_000
    assert out.loc[0].var_num_e8 == 4_000_000
    assert out.loc[1].var_num_e8 == 0


def test_dau_overlap_jaccard(ray_session, tmp_path):
    from ctdray.pipelines.analytics import dau_overlap_jaccard
    # day1 users {1,2}; day2 users {2,3}; day4 users {9}
    rows = [(1, "2024-01-01"), (2, "2024-01-01"), (2, "2024-01-02"),
            (3, "2024-01-02"), (9, "2024-01-04")]
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_ts(d + "T05:00") for _, d in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "event_type": pa.array(["x"] * len(rows)),
        "value": pa.array([0.0] * len(rows)),
    }), str(tmp_path / "events.parquet"))
    out = dau_overlap_jaccard(str(tmp_path)).to_pandas()
    assert len(out) == 1      # only day1->day2 is an adjacent pair
    assert out.n_today[0] == 2 and out.n_next[0] == 2
    assert out.n_both[0] == 1
    assert out.jaccard_ppm[0] == 333_333


def test_join_size_estimate(ray_session, tmp_path):
    from ctdray.pipelines.analytics import join_size_estimate
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3], pa.int64())}),
        str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 9], pa.int64())}),
        str(tmp_path / "orders.parquet"))
    out = join_size_estimate(str(tmp_path)).to_pandas()
    assert out.n_keys_both[0] == 2          # keys 1, 2
    assert out.est_join_rows[0] == 3        # 2*1 + 1*1
    assert out.n_left_rows[0] == 3          # rows with matching keys


def test_event_value_log2_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import event_value_log2_hist
    pq.write_table(pa.table({
        "event_id": pa.array(range(4), pa.int64()),
        "ts": pa.array([_ts("2024-01-01")] * 4, pa.timestamp("us")),
        "user_id": pa.array([1] * 4, pa.int64()),
        "event_type": pa.array(["a"] * 4),
        # cents: 0 -> -1 ; 100 -> 6 ; 128 -> 7 ; 255 -> 7
        "value": pa.array([0.0, 1.0, 1.28, 2.55]),
    }), str(tmp_path / "events.parquet"))
    out = event_value_log2_hist(str(tmp_path)).to_pandas() \
        .set_index("bucket").sort_index()
    assert out.loc[-1].n == 1
    assert out.loc[6].n == 1
    assert out.loc[7].n == 2

"""Batch 18: gaps-and-islands streaks, reciprocal-best trade partners,
int8 embedding quantization, daily new-vs-returning split."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def _events(tmp_path, rows):
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_ts(r[1]) for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array(["view"] * len(rows)),
        "value": pa.array([0.0] * len(rows)),
    }), str(tmp_path / "events.parquet"))


def test_streaks_islands(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_active_day_streaks
    _events(tmp_path, [
        # user 1: days 1,2,3 then 5 -> longest 3, active 4
        (1, "2024-01-01T05:00"), (1, "2024-01-02T06:00"),
        (1, "2024-01-02T07:00"), (1, "2024-01-03T01:00"),
        (1, "2024-01-05T01:00"),
        # user 2: single day
        (2, "2024-02-01T00:00"),
    ])
    out = user_active_day_streaks(str(tmp_path)).to_pandas() \
        .set_index("user_id").sort_index()
    assert list(out.n_active_days) == [4, 1]
    assert list(out.longest_streak) == [3, 1]


def test_mutual_top_partners(ray_session, tmp_path):
    from ctdray.pipelines.analytics import mutual_top_partner_nations
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int64()),
        "n_name": pa.array(["A", "B", "C"]),
        "n_regionkey": pa.array([0, 0, 0], pa.int64()),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([10, 11, 12], pa.int64()),
        "s_nationkey": pa.array([0, 1, 2], pa.int64()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([20, 21, 22], pa.int64()),
        "c_nationkey": pa.array([0, 1, 2], pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([100, 101, 102, 103], pa.int64()),
        "o_custkey": pa.array([21, 20, 22, 20], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    # A->B 10.00, B->A 8.00 (mutual); C->A 1.00 (A's top is B, so
    # C's best (A) is not reciprocated)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([100, 101, 103], pa.int64()),
        "l_suppkey": pa.array([10, 11, 12], pa.int64()),
        "l_extendedprice": pa.array([10.0, 8.0, 1.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = mutual_top_partner_nations(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert (out.nation_a[0], out.nation_b[0]) == ("A", "B")
    assert (out.volume_ab[0], out.volume_ba[0]) == (1000, 800)


def test_quantize_int8_trunc(ray_session, tmp_path):
    from ctdray.pipelines.analytics import embedding_quantize_int8
    pq.write_table(pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[1.0, -0.5, 0.25], [2.0, 2.0, -2.0]],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 0], pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))
    out = embedding_quantize_int8(str(tmp_path)).to_pandas() \
        .set_index("vec_id").sort_index()
    # vec 0: m=1 -> q = [127, -63, 31] (trunc toward zero)
    assert out.q_sum[0] == 127 - 63 + 31
    assert out.q_min[0] == -63 and out.q_max[0] == 127
    assert out.scale_e6[0] == 1_000_000
    # vec 1: m=2 -> q = [127, 127, -127]
    assert out.q_sum[1] == 127 and out.q_min[1] == -127


def test_new_vs_returning(ray_session, tmp_path):
    from ctdray.pipelines.analytics import daily_new_vs_returning
    _events(tmp_path, [
        (1, "2024-01-01T05:00"), (2, "2024-01-01T06:00"),
        (1, "2024-01-02T05:00"), (3, "2024-01-02T06:00"),
        (1, "2024-01-02T07:00"),
    ])
    out = daily_new_vs_returning(str(tmp_path)).to_pandas() \
        .sort_values("day").reset_index(drop=True)
    assert list(out.new_users) == [2, 1]
    assert list(out.returning_users) == [0, 1]
    assert out.day[0] == np.datetime64("2024-01-01")

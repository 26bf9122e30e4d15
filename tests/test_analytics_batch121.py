"""Batch 121: LWW compaction, best-lag sweep, salt plan, hub path
census."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_lww_compaction_by_type(ray_session, tmp_path):
    from ctdray.pipelines.analytics import lww_compaction_by_type
    # (user 1, a): later row (2.00) wins; (user 2, a): single 3.00
    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "event_type": pa.array(["a", "a", "a"]),
        "ts": pa.array([_ts("2024-01-01T00:00:00"),
                        _ts("2024-01-02T00:00:00"),
                        _ts("2024-01-01T00:00:00")],
                       pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "value": pa.array([1.0, 2.0, 3.0]),
    }), str(tmp_path / "events.parquet"))
    out = lww_compaction_by_type(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [("a", 2, 500)]


def test_orders_count_revenue_best_lag(ray_session, tmp_path):
    from ctdray.pipelines.analytics import orders_count_revenue_best_lag
    # day 1: cnt 1 rev 100; day 2: cnt 2 rev 300 ->
    # dot(0)=700, dot(+1)=300, dot(-1)=200
    pq.write_table(pa.table({
        "o_orderdate": pa.array([_ts("1995-01-01"), _ts("1995-01-02"),
                                 _ts("1995-01-02")],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([1.00, 1.00, 2.00]),
    }), str(tmp_path / "orders.parquet"))
    out = orders_count_revenue_best_lag(str(tmp_path)).to_pandas() \
        .set_index("lag")
    assert out.loc[0].dot_product == "700"
    assert out.loc[1].dot_product == "300"
    assert out.loc[-1].dot_product == "200"
    assert out.loc[0].is_best == 1 and out.is_best.sum() == 1


def test_join_salt_plan(ray_session, tmp_path):
    from ctdray.pipelines.analytics import join_salt_plan
    pq.write_table(pa.table({
        "o_custkey": pa.array([1] * 9 + [2], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    out = join_salt_plan(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(1, 1), (2, 1)]


def test_hub_pair_path_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import hub_pair_path_census
    # edges 1-2, 1-3, 1-4, 2-3: hubs 1 and 2; direct edge, one
    # common neighbor (3), no length-3 path
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10, 11, 11, 12, 12, 13, 13],
                               pa.int64()),
        "l_partkey": pa.array([1, 2, 1, 3, 1, 4, 2, 3], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = hub_pair_path_census(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(1, 1), (2, 1), (3, 0)]

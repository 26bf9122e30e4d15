"""Batch 63: 1-D 2-means, anagram groups, session handoffs, domestic
supply share."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_daily_revenue_kmeans2(ray_session, tmp_path):
    from ctdray.pipelines.analytics import daily_revenue_kmeans2
    # two regimes: days of ~100 and days of ~900
    vals = [100.0, 110.0, 90.0, 900.0, 910.0]
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(5), pa.int64()),
        "o_orderdate": pa.array(
            [_ts(f"2024-01-{i:02d}") for i in range(1, 6)],
            pa.timestamp("us")),
        "o_totalprice": pa.array(vals),
    }), str(tmp_path / "orders.parquet"))
    out = daily_revenue_kmeans2(str(tmp_path)).to_pandas()
    assert out.n_lo[0] == 3 and out.n_hi[0] == 2
    assert out.centroid_lo[0] == 10000      # (9000+10000+11000)//3
    assert out.centroid_hi[0] == 90500


def test_token_anagram_groups(ray_session, tmp_path):
    from ctdray.pipelines.analytics import token_anagram_groups
    pq.write_table(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        # "abc" & "cab" anagrams; "abc" repeated (distinct once);
        # "xyz" alone
        "text": pa.array(["abc cab abc xyz"]),
    }), str(tmp_path / "documents.parquet"))
    out = token_anagram_groups(str(tmp_path)).to_pandas()
    assert list(out.akey) == ["abc"]
    assert list(out.n_tokens) == [2]


def test_session_handoff_matrix(ray_session, tmp_path):
    from ctdray.pipelines.analytics import session_handoff_matrix
    # session1 ends with 'click'; session2 (2h later) starts 'view'
    pq.write_table(pa.table({
        "event_id": pa.array(range(4), pa.int64()),
        "ts": pa.array([_ts("2024-01-01T00:00"), _ts("2024-01-01T00:10"),
                        _ts("2024-01-01T03:00"), _ts("2024-01-01T03:05")],
                       pa.timestamp("us")),
        "user_id": pa.array([1] * 4, pa.int64()),
        "event_type": pa.array(["view", "click", "view", "purchase"]),
        "value": pa.array([0.0] * 4),
    }), str(tmp_path / "events.parquet"))
    out = session_handoff_matrix(str(tmp_path)).to_pandas()
    assert list(out.from_type) == ["click"]
    assert list(out.to_type) == ["view"]
    assert list(out.n) == [1]


def test_domestic_supply_share(ray_session, tmp_path):
    from ctdray.pipelines.analytics import domestic_supply_share
    pq.write_table(pa.table({
        "s_suppkey": pa.array([10, 11], pa.int64()),
        "s_nationkey": pa.array([0, 1], pa.int32()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([100], pa.int64()),
        "c_nationkey": pa.array([0], pa.int32()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1], pa.int64()),
        "o_custkey": pa.array([100], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        # 30.00 domestic (supp nation 0), 10.00 foreign (nation 1)
        "l_orderkey": pa.array([1, 1], pa.int64()),
        "l_suppkey": pa.array([10, 11], pa.int64()),
        "l_extendedprice": pa.array([30.0, 10.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = domestic_supply_share(str(tmp_path)).to_pandas()
    assert out.domestic_cents[0] == 3000
    assert out.total_cents[0] == 4000
    assert out.domestic_ppm[0] == 750_000

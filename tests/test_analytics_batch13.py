"""Cross-source token-set dedup, RANGE-frame 1h window, ROLLUP
subtotals, and top shared-chunk pairs — tiny hand-built inputs pin the
exact semantics the DuckDB oracles verify at driver scale."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_cross_source_dup_docs_token_set_key(ray_session, tmp_path):
    from ctdray.pipelines.analytics import cross_source_dup_docs
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        # docs 1/2: same token set (order + repeats differ), sources differ
        # doc 3: same set but SAME source as doc 1 -> still dup via doc 2
        # doc 4: unique set
        "text": pa.array(["b a a", "a b", "b b a", "zzz"]),
        "source": pa.array(["s1", "s2", "s1", "s1"]),
    }), str(tmp_path / "documents.parquet"))
    out = cross_source_dup_docs(str(tmp_path)).to_pandas()
    assert sorted(out.doc_id) == [1, 2, 3]


def test_cross_source_same_source_only_not_dup(ray_session, tmp_path):
    from ctdray.pipelines.analytics import cross_source_dup_docs
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a b", "b a"]),
        "source": pa.array(["s1", "s1"]),
    }), str(tmp_path / "documents.parquet"))
    out = cross_source_dup_docs(str(tmp_path)).to_pandas()
    assert len(out) == 0


def test_user_value_1h_window_range_frame_peers(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_value_1h_window
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "user_id": pa.array([7, 7, 7, 7, 8], pa.int64()),
        # u7: 10:00, 10:30, 10:30 (peer), 11:45; u8 independent
        "ts": pa.array([_ts("1995-01-01T10:00:00"),
                        _ts("1995-01-01T10:30:00"),
                        _ts("1995-01-01T10:30:00"),
                        _ts("1995-01-01T11:45:00"),
                        _ts("1995-01-01T10:00:00")], pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 4.0, 8.0, 99.0]),
    }), str(tmp_path / "events.parquet"))
    out = user_value_1h_window(str(tmp_path)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    # event 1: only itself -> 100. events 2 AND 3 are RANGE peers: both
    # frames span 09:30-10:30 and include each other -> 100+200+400=700.
    # event 4: 10:45-11:45 -> only itself (10:30 is outside) -> 800.
    assert list(out.w_cents) == [100, 700, 700, 800, 9900]


def test_user_value_1h_window_boundary_inclusive(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_value_1h_window
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([7, 7], pa.int64()),
        # exactly 1 hour apart: RANGE 1h PRECEDING includes the boundary
        "ts": pa.array([_ts("1995-01-01T10:00:00"),
                        _ts("1995-01-01T11:00:00")], pa.timestamp("us")),
        "value": pa.array([1.0, 2.0]),
    }), str(tmp_path / "events.parquet"))
    out = user_value_1h_window(str(tmp_path)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert list(out.w_cents) == [100, 300]


def test_region_nation_rollup_levels(ray_session, tmp_path):
    from ctdray.pipelines.analytics import region_nation_rollup
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int64()),
        "r_name": pa.array(["WEST", "EAST"]),
    }), str(tmp_path / "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int64()),
        "n_name": pa.array(["N0", "N1", "N2"]),
        "n_regionkey": pa.array([0, 0, 1], pa.int64()),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_nationkey": pa.array([0, 1, 2], pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 2, 2, 3], pa.int64()),
        "o_totalprice": pa.array([1.0, 2.0, 3.0, 4.0]),
    }), str(tmp_path / "orders.parquet"))
    out = region_nation_rollup(str(tmp_path)).to_pandas()
    got = {(r, n): (c, k) for r, n, c, k in zip(
        out.region_name, out.nation_name, out.revenue_cents, out.n_orders)}
    assert got[("WEST", "N0")] == (100, 1)
    assert got[("WEST", "N1")] == (500, 2)
    assert got[("WEST", "ALL")] == (600, 3)
    assert got[("EAST", "N2")] == (400, 1)
    assert got[("EAST", "ALL")] == (400, 1)
    assert got[("ALL", "ALL")] == (1000, 4)
    assert len(got) == 6


def test_top_chunk_overlap_pairs_counts_and_cap(ray_session, tmp_path):
    from ctdray.pipelines.analytics import top_chunk_overlap_pairs
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        # 2-token chunks: docs 1/2 share [a b] and [c d]; doc 3 shares
        # [a b] only; chunk [x y] is in docs 1..5 (df=5 > cap 3 -> dropped)
        "text": pa.array(["a b c d x y", "a b c d x y",
                          "a b q q x y", "x y", "x y"]),
    }), str(tmp_path / "documents.parquet"))
    out = top_chunk_overlap_pairs(str(tmp_path), chunk_tokens=2,
                                  max_chunk_df=3, n=10).to_pandas()
    pairs = list(zip(out.doc_a, out.doc_b, out.n_shared))
    assert pairs[0] == (1, 2, 2)
    assert set(pairs[1:]) == {(1, 3, 1), (2, 3, 1)}

"""Batch 82: 3-step funnel, Simpson index, share movers, antipairs."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_session_3step_funnel(ray_session, tmp_path):
    from ctdray.pipelines.analytics import session_3step_funnel
    # session A: view click purchase (full); session B: view purchase
    # click (view but NOT full — click after purchase)
    rows = [("view", "2024-01-01T00:00"), ("click", "2024-01-01T00:05"),
            ("purchase", "2024-01-01T00:10"),
            ("view", "2024-01-01T05:00"), ("purchase", "2024-01-01T05:05"),
            ("click", "2024-01-01T05:10")]
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_ts(t) for _, t in rows], pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array([t for t, _ in rows]),
        "value": pa.array([0.0] * len(rows)),
    }), str(tmp_path / "events.parquet"))
    out = session_3step_funnel(str(tmp_path)).to_pandas()
    assert out.n_sessions[0] == 2
    assert out.n_view_sessions[0] == 2
    assert out.n_full_funnel[0] == 1


def test_corpus_simpson_index(ray_session, tmp_path):
    from ctdray.pipelines.analytics import corpus_simpson_index
    pq.write_table(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        # a x3, b x1 -> sum_f2 = 9 + 1 = 10
        "text": pa.array(["a a a b"]),
    }), str(tmp_path / "documents.parquet"))
    out = corpus_simpson_index(str(tmp_path)).to_pandas()
    assert out.n_occurrences[0] == 4
    assert out.sum_f2[0] == 10
    assert out.n_types[0] == 2


def test_supplier_share_movers(ray_session, tmp_path):
    from ctdray.pipelines.analytics import supplier_share_movers
    pq.write_table(pa.table({
        # s1: 100 before, 0 after; s2: 0 before, 100 after
        "l_suppkey": pa.array([1, 2], pa.int64()),
        "l_shipdate": pa.array([_ts("1996-01-01"), _ts("1999-01-01")],
                               pa.timestamp("us")),
        "l_extendedprice": pa.array([100.0, 100.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = supplier_share_movers(str(tmp_path)).to_pandas() \
        .set_index("l_suppkey")
    assert out.loc[1].share_before_ppm == 1_000_000
    assert out.loc[1].delta_ppm == -1_000_000
    assert out.loc[2].delta_ppm == 1_000_000


def test_popular_part_antipairs(ray_session, tmp_path):
    from ctdray.pipelines.analytics import popular_part_antipairs
    # three parts; 1 & 2 co-ordered; 3 never with either
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_partkey": pa.array([1, 2, 3], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = popular_part_antipairs(str(tmp_path), k=3).to_pandas()
    got = set(zip(out.part_a, out.part_b))
    assert got == {(1, 3), (2, 3)}

"""Batch 28: integer percent-rank, association lift, token-pair lift,
session bounce stats."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_pctile_rank_ties(ray_session, tmp_path):
    from ctdray.pipelines.analytics import supplier_revenue_pctile
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_nationkey": pa.array([0, 0, 0], pa.int64()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0], pa.int64()),
        "n_name": pa.array(["N"]),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        # revenues: s1=100, s2=100 (tie -> RANK 1), s3=300 (rank 3)
        "l_suppkey": pa.array([1, 2, 3], pa.int64()),
        "l_extendedprice": pa.array([1.0, 1.0, 3.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = supplier_revenue_pctile(str(tmp_path)).to_pandas() \
        .set_index("s_suppkey").sort_index()
    assert list(out.pct_ppm) == [0, 0, 1_000_000]


def test_lang_source_lift_identity(ray_session, tmp_path):
    from ctdray.pipelines.analytics import lang_source_lift
    pq.write_table(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        # en only in src0 (lift 2x), fr only in src1 (lift 2x)
        "lang": pa.array(["en", "en", "fr", "fr"]),
        "source": pa.array(["src0", "src0", "src1", "src1"]),
    }), str(tmp_path / "documents.parquet"))
    out = lang_source_lift(str(tmp_path)).to_pandas()
    assert list(out.lift_ppm) == [2_000_000, 2_000_000]
    assert list(out.n_ab) == [2, 2]


def test_token_pair_lift(ray_session, tmp_path):
    from ctdray.pipelines.analytics import token_pair_lift_topk
    # "a b" always co-occur (lift 10/5/... ); "a c" partial
    texts = ["a b"] * 5 + ["a b c"] * 5
    pq.write_table(pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "text": pa.array(texts),
    }), str(tmp_path / "documents.parquet"))
    out = token_pair_lift_topk(str(tmp_path), n=5, min_support=5) \
        .to_pandas()
    got = {(a, b): p for a, b, p in zip(out.tok_a, out.tok_b,
                                        out.lift_ppm)}
    # a,b: n=10, n_ab=10, df_a=df_b=10 -> lift 1.0
    assert got[("a", "b")] == 1_000_000
    # b,c: n_ab=5, df_b=10, df_c=5 -> 10*5*1e6 // 50 = 1_000_000
    assert got[("b", "c")] == 1_000_000


def test_bounce_sessions(ray_session, tmp_path):
    from ctdray.pipelines.analytics import session_bounce_stats
    pq.write_table(pa.table({
        "event_id": pa.array(range(4), pa.int64()),
        # user 1: session A = [view, cart] (not bounce),
        # session B (2h later) = [view] (bounce)
        # user 2: single purchase session (bounce)
        "ts": pa.array([_ts("2024-01-01T00:00"), _ts("2024-01-01T00:10"),
                        _ts("2024-01-01T03:00"),
                        _ts("2024-01-01T00:00")], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "event_type": pa.array(["view", "cart", "view", "purchase"]),
        "value": pa.array([0.0] * 4),
    }), str(tmp_path / "events.parquet"))
    out = session_bounce_stats(str(tmp_path)).to_pandas()
    got = {t: (s, b) for t, s, b in zip(out.first_event_type,
                                        out.n_sessions, out.n_bounce)}
    assert got == {"view": (2, 1), "purchase": (1, 1)}

"""Batch 120: date inversions, QQ table, replay checksums,
expensive-line-ships-last."""
import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_order_date_inversions(ray_session, tmp_path):
    from ctdray.pipelines.analytics import order_date_inversions
    # sampled keys (k % 4 == 0): 0, 4, 8 with dates d3, d1, d2:
    # inversions (0,4) and (0,8) -> 2; key 5 is not sampled
    pq.write_table(pa.table({
        "o_orderkey": pa.array([0, 4, 5, 8], pa.int64()),
        "o_orderdate": pa.array([_ts("1995-01-03"), _ts("1995-01-01"),
                                 _ts("1995-01-09"), _ts("1995-01-02")],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    out = order_date_inversions(str(tmp_path)).to_pandas()
    assert out.n_rows[0] == 3
    assert out.n_inversions[0] == "2"


def test_order_date_inversions_cross_chunk(ray_session, tmp_path):
    from ctdray.pipelines.analytics import order_date_inversions
    # keys 0 (chunk 0) and 4096 (chunk 1), dates reversed -> the one
    # inversion is CROSS-chunk (driver histogram sweep)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([0, 4096], pa.int64()),
        "o_orderdate": pa.array([_ts("1995-01-05"),
                                 _ts("1995-01-01")],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    out = order_date_inversions(str(tmp_path)).to_pandas()
    assert out.n_chunks[0] == 2
    assert out.n_inversions[0] == "1"


def test_orders_vs_lines_qq_table(ray_session, tmp_path):
    from ctdray.pipelines.analytics import orders_vs_lines_qq_table
    # orders cents 100..1000, lines cents 200..2000 (x2):
    # every decile's line value is exactly 2x the order value
    pq.write_table(pa.table({
        "o_totalprice": pa.array([float(i) for i in range(1, 11)]),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_extendedprice": pa.array([2.0 * i for i in range(1, 11)]),
    }), str(tmp_path / "lineitem.parquet"))
    out = orders_vs_lines_qq_table(str(tmp_path)).to_pandas()
    assert out.q.tolist() == list(range(10, 100, 10))
    assert (out.line_cents == 2 * out.order_cents).all()
    assert (out.ratio_ppm == 2_000_000).all()


def test_user_replay_checksum_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_replay_checksum_hist
    # user 1 sequence "a|b" (ts order, not event_id order);
    # user 2 sequence "b"
    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "ts": pa.array([_ts("2024-01-01T01:00:00"),
                        _ts("2024-01-01T00:00:00"),
                        _ts("2024-01-01T02:00:00")],
                       pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "event_type": pa.array(["b", "a", "b"]),
    }), str(tmp_path / "events.parquet"))
    out = user_replay_checksum_hist(str(tmp_path)).to_pandas()
    exp = {}
    for seq in ("a|b", "b"):
        b = int(hashlib.md5(seq.encode()).hexdigest()[:2], 16) % 64
        exp[b] = exp.get(b, 0) + 1
    got = dict(zip(out.cks_bucket, out.n_users))
    assert got == exp


def test_expensive_line_ships_last(ray_session, tmp_path):
    from ctdray.pipelines.analytics import expensive_line_ships_last
    # order 1: expensive line ships last (hit); order 2: expensive
    # line ships first (miss); order 3 single-line (excluded)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "l_extendedprice": pa.array([1.0, 5.0, 5.0, 1.0, 9.0]),
        "l_shipdate": pa.array([_ts("1995-01-01"), _ts("1995-01-05"),
                                _ts("1995-01-01"), _ts("1995-01-05"),
                                _ts("1995-01-01")],
                               pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT",
                                     "5-LOW"]),
    }), str(tmp_path / "orders.parquet"))
    out = expensive_line_ships_last(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [("1-URGENT", 2, 1)]

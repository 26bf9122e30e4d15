"""Batch 116: peak concurrent sessions, first-digit two-sample,
IBLT difference cells, hash bit-balance audit."""
import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def _h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_daily_peak_concurrent_sessions(ray_session, tmp_path):
    from ctdray.pipelines.analytics import daily_peak_concurrent_sessions
    # day 1: user 1 session [00:00, 00:10], user 2 instantaneous
    # session at 00:05 -> peak 2; day 2: one session -> peak 1
    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 2, 1], pa.int64()),
        "ts": pa.array([_ts("2024-01-01T00:00:00"),
                        _ts("2024-01-01T00:10:00"),
                        _ts("2024-01-01T00:05:00"),
                        _ts("2024-01-02T09:00:00")],
                       pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
    }), str(tmp_path / "events.parquet"))
    out = daily_peak_concurrent_sessions(str(tmp_path)).to_pandas()
    assert out.peak_sessions.tolist() == [2, 1]
    assert out.day.dt.day.tolist() == [1, 2]


def test_price_firstdigit_two_sample(ray_session, tmp_path):
    from ctdray.pipelines.analytics import price_firstdigit_two_sample
    # orders cents {100, 250} -> digits 1, 2; lines cents {100} ->
    # digit 1.  t1=2, t2=1: digit 1 diff = 1*1 - 1*2 = -1;
    # digit 2 diff = 1*1 - 0*2 = +1
    pq.write_table(pa.table({
        "o_totalprice": pa.array([1.00, 2.50]),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_extendedprice": pa.array([1.00]),
    }), str(tmp_path / "lineitem.parquet"))
    out = price_firstdigit_two_sample(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (1, 1, 1, "1", -1), (2, 1, 0, "1", 1)]


def test_iblt_difference_cells(ray_session, tmp_path):
    from ctdray.pipelines.analytics import iblt_difference_cells
    # keys 31 (okey 3, ln 7) and 62 (okey 7, ln 6) are in the lost
    # shard (k % 31 == 0); key 9 (okey 1, ln 1) is not
    pq.write_table(pa.table({
        "l_orderkey": pa.array([3, 7, 1], pa.int64()),
        "l_linenumber": pa.array([7, 6, 1], pa.int32()),
    }), str(tmp_path / "lineitem.parquet"))
    out = iblt_difference_cells(str(tmp_path)).to_pandas()
    exp = {}
    for k in (31, 62):
        for i in range(3):
            c = _h60(f"{i}:{k}") % 64
            n, x = exp.get(c, (0, 0))
            exp[c] = (n + 1, x ^ k)
    got = {r.cell: (r.n_keys, r.key_xor) for r in out.itertuples()}
    assert got == exp


def test_hash_bit_balance_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import hash_bit_balance_audit
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 2], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    out = hash_bit_balance_audit(str(tmp_path)).to_pandas()
    assert out.bit.tolist() == list(range(60))
    assert out.n_keys.tolist() == [2] * 60
    h1, h2 = _h60("1"), _h60("2")
    exp = [((h1 >> b) & 1) + ((h2 >> b) & 1) for b in range(60)]
    assert out.n_set.tolist() == exp

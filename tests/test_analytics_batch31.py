"""Batch 31: shard balance, phrase search, argmax day per nation, exact
mode."""
import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_shard_assignment(ray_session, tmp_path):
    from ctdray.pipelines.analytics import doc_hash_shard_balance
    n = 40
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["x"] * n),
        "n_chars": pa.array([1] * n, pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    out = doc_hash_shard_balance(str(tmp_path)).to_pandas()
    assert out.n_docs.sum() == n
    want = {}
    for i in range(n):
        sh = int(hashlib.md5(str(i).encode()).hexdigest()[:12],
                 16) % 16
        want[sh] = want.get(sh, 0) + 1
    got = dict(zip(out.shard, out.n_docs))
    assert got == want


def test_phrase_word_boundaries(ray_session, tmp_path):
    from ctdray.pipelines.analytics import docs_with_phrase
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["the key agg row here",   # match
                          "key agg rows",            # boundary: no
                          "key agg row"]),           # match at edges
    }), str(tmp_path / "documents.parquet"))
    out = docs_with_phrase(str(tmp_path)).to_pandas()
    assert sorted(out.doc_id) == [0, 2]


def test_peak_day_per_nation(ray_session, tmp_path):
    from ctdray.pipelines.analytics import top_revenue_day_per_nation
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1], pa.int64()),
        "s_nationkey": pa.array([0], pa.int64()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0], pa.int64()),
        "n_name": pa.array(["N"]),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        # day1: 5.00; day2: 2.00+3.00=5.00 (tie -> earliest day wins)
        "l_suppkey": pa.array([1, 1, 1], pa.int64()),
        "l_shipdate": pa.array([_ts("1995-01-02T10:00"),
                                _ts("1995-01-01T09:00"),
                                _ts("1995-01-02T11:00")],
                               pa.timestamp("us")),
        "l_extendedprice": pa.array([2.00, 5.00, 3.00]),
    }), str(tmp_path / "lineitem.parquet"))
    out = top_revenue_day_per_nation(str(tmp_path)).to_pandas()
    assert out.peak_day[0] == np.datetime64("1995-01-01", "us")
    assert out.revenue_cents[0] == 500


def test_quantity_mode_tiebreak(ray_session, tmp_path):
    from ctdray.pipelines.analytics import lineitem_quantity_mode
    pq.write_table(pa.table({
        # 7 and 3 both appear twice -> tie broken to smaller value 3
        "l_quantity": pa.array([7.0, 3.0, 7.0, 3.0, 9.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = lineitem_quantity_mode(str(tmp_path)).to_pandas()
    assert (out.mode_qty[0], out.n_occurrences[0],
            out.n_distinct[0]) == (3, 2, 3)

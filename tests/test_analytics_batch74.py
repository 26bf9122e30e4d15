"""Batch 74: z-order locality, hapax tail, value-split retention,
multi-line share."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_zorder_locality_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import zorder_locality_audit
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(3), pa.int64()),
        "o_custkey": pa.array([1, 1, 1000], pa.int64()),
        "o_orderdate": pa.array([_ts("1995-01-01"), _ts("1995-01-02"),
                                 _ts("1995-01-01")], pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    out = zorder_locality_audit(str(tmp_path)).to_pandas()
    assert out.n_rows[0] == 3
    assert out.n_chunks[0] >= 1
    # mirror the interleave in numpy as an independent check
    ck = np.array([1, 1, 1000], np.int64)
    day = np.array([0, 1, 0], np.int64)
    zv = np.zeros(3, np.int64)
    for i in range(20):
        zv |= ((day >> i) & 1) << (2 * i)
        zv |= ((ck >> i) & 1) << (2 * i + 1)
    chunks = np.unique(zv >> 30)
    assert out.n_chunks[0] == len(chunks)


def test_lang_hapax_tail_mass(ray_session, tmp_path):
    from ctdray.pipelines.analytics import lang_hapax_tail_mass
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        # en: tokens a a b -> 3 occurrences, hapax {b} -> 333333
        "text": pa.array(["a a b", "x"]),
        "lang": pa.array(["en", "de"]),
    }), str(tmp_path / "documents.parquet"))
    out = lang_hapax_tail_mass(str(tmp_path)).to_pandas() \
        .set_index("lang")
    assert out.loc["en"].n_occurrences == 3
    assert out.loc["en"].n_hapax == 1
    assert out.loc["en"].tail_ppm == 333_333
    assert out.loc["de"].tail_ppm == 1_000_000


def test_value_split_retention(ray_session, tmp_path):
    from ctdray.pipelines.analytics import value_split_retention
    # users: 1 (900, active recently), 2 (100, stale), 3 (50, stale)
    rows = [(1, "2024-06-01", 9.0), (2, "2024-01-01", 1.0),
            (3, "2024-01-01", 0.5)]
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_ts(d + "T00:00") for _, d, _v in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([u for u, _, _v in rows], pa.int64()),
        "event_type": pa.array(["x"] * len(rows)),
        "value": pa.array([v for _, _, v in rows]),
    }), str(tmp_path / "events.parquet"))
    out = value_split_retention(str(tmp_path)).to_pandas() \
        .set_index("segment")
    # median (lower) of {900,100,50} = 100 -> high = {user1}
    assert out.loc["high"].n_users == 1
    assert out.loc["high"].retention_ppm == 1_000_000
    assert out.loc["low"].n_users == 2
    assert out.loc["low"].n_retained == 0


def test_priority_multiline_share(ray_session, tmp_path):
    from ctdray.pipelines.analytics import priority_multiline_share
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_orderpriority": pa.array(["P1", "P1"]),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = priority_multiline_share(str(tmp_path)).to_pandas()
    assert out.n_orders[0] == 2
    assert out.n_multi[0] == 1
    assert out.multi_ppm[0] == 500_000

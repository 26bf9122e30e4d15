"""Batch 64: split manifest, sync manifest, session sweep, supplier
diversity histogram."""
import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_dataset_split_manifest(ray_session, tmp_path):
    from ctdray.pipelines.analytics import dataset_split_manifest
    ids = list(range(50))
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(["x"] * 50),
        "lang": pa.array(["en"] * 50),
    }), str(tmp_path / "documents.parquet"))
    out = dataset_split_manifest(str(tmp_path)).to_pandas() \
        .set_index("split")
    exp = {"train": 0, "val": 0, "test": 0}
    for d in ids:
        b = int(hashlib.md5(str(d).encode()).hexdigest()[:2], 16) % 10
        exp["train" if b < 8 else "val" if b == 8 else "test"] += 1
    for k, v in exp.items():
        if v:
            assert out.loc[k].n_docs == v
    assert out.n_docs.sum() == 50


def test_lineitem_sync_manifest(ray_session, tmp_path):
    from ctdray.pipelines.analytics import lineitem_sync_manifest
    pq.write_table(pa.table({
        # chunks 0 (orderkey 5) and 1 (orderkey 10001)
        "l_orderkey": pa.array([5, 5, 10001], pa.int64()),
        "l_linenumber": pa.array([1, 2, 1], pa.int32()),
        "l_quantity": pa.array([1.0, 2.0, 3.0]),
        "l_shipdate": pa.array([_ts("2024-01-01"), _ts("2024-02-01"),
                                _ts("2024-03-01")], pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = lineitem_sync_manifest(str(tmp_path)).to_pandas() \
        .set_index("chunk").sort_index()
    cs0 = (int(hashlib.md5(b"5|1|100").hexdigest()[:15], 16)
           ^ int(hashlib.md5(b"5|2|200").hexdigest()[:15], 16))
    assert out.loc[0].n_rows == 2
    assert out.loc[0].checksum == cs0
    assert out.loc[0].max_ship == np.datetime64("2024-02-01", "us")
    assert out.loc[1].n_rows == 1


def test_session_count_sweep(ray_session, tmp_path):
    from ctdray.pipelines.analytics import session_count_sweep
    # gaps: 10 min, 40 min -> at 5m: 3 sessions; 15m: 2; 30m: 2; 60m: 1
    pq.write_table(pa.table({
        "event_id": pa.array(range(3), pa.int64()),
        "ts": pa.array([_ts("2024-01-01T00:00"), _ts("2024-01-01T00:10"),
                        _ts("2024-01-01T00:50")], pa.timestamp("us")),
        "user_id": pa.array([1] * 3, pa.int64()),
        "event_type": pa.array(["x"] * 3),
        "value": pa.array([0.0] * 3),
    }), str(tmp_path / "events.parquet"))
    out = session_count_sweep(str(tmp_path)).to_pandas() \
        .set_index("gap_minutes").sort_index()
    assert out.loc[5].n_sessions == 3
    assert out.loc[15].n_sessions == 2
    assert out.loc[30].n_sessions == 2
    assert out.loc[60].n_sessions == 1


def test_customer_supplier_diversity_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import (
        customer_supplier_diversity_hist)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([7, 8], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        # cust 7 buys from suppliers {10, 11}; cust 8 from {10}
        "l_orderkey": pa.array([1, 1, 1, 2], pa.int64()),
        "l_suppkey": pa.array([10, 11, 10, 10], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = customer_supplier_diversity_hist(str(tmp_path)).to_pandas() \
        .set_index("n_suppliers").sort_index()
    assert out.loc[1].n_customers == 1
    assert out.loc[2].n_customers == 1

"""Batch 109: order-total reconciliation, intersession gaps,
doc TTR, order top-line share."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_order_total_reconciliation(ray_session, tmp_path):
    from ctdray.pipelines.analytics import order_total_reconciliation
    # order 1: one line 1.00, no disc/tax -> net_e4 = 100*100*100 =
    # 1000000; header 1.00 -> tot_e4 1000000 -> sign 0
    # order 2: line 2.00 -> net 2000000; header 1.00 -> sign +1
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2], pa.int64()),
        "l_discount": pa.array([0.0, 0.0]),
        "l_tax": pa.array([0.0, 0.0]),
        "l_extendedprice": pa.array([1.0, 2.0]),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_totalprice": pa.array([1.0, 1.0]),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT"]),
    }), str(tmp_path / "orders.parquet"))
    out = order_total_reconciliation(str(tmp_path)).to_pandas()
    assert dict(zip(out.sign, out.n_orders)) == {0: 1, 1: 1}


def test_intersession_gap_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import intersession_gap_hist
    # user 1: gaps 10 min (within session), 2h (gap_hours 2),
    # 100h (clamped to 48)
    ts = pa.array([_ts("2024-01-01T00:00:00"),
                   _ts("2024-01-01T00:10:00"),
                   _ts("2024-01-01T02:10:00"),
                   _ts("2024-01-05T06:10:00")], pa.timestamp("us"))
    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "ts": ts,
    }), str(tmp_path / "events.parquet"))
    out = intersession_gap_hist(str(tmp_path)).to_pandas()
    assert dict(zip(out.gap_hours, out.n_gaps)) == {2: 1, 48: 1}


def test_doc_ttr_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import doc_ttr_hist
    # "a b c" -> ttr 1.0 -> dec 10; "a a a a" -> 0.25 -> dec 2
    pq.write_table(pa.table({
        "text": pa.array(["a b c", "a a a a"]),
    }), str(tmp_path / "documents.parquet"))
    out = doc_ttr_hist(str(tmp_path)).to_pandas()
    assert dict(zip(out.ttr_decile, out.n_docs)) == {2: 1, 10: 1}


def test_order_topline_share_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import order_topline_share_hist
    # order 1: lines 3.00 + 1.00 -> top share 750000 ppm -> dec 7
    # order 2: single line -> dropped
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_extendedprice": pa.array([3.0, 1.0, 9.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = order_topline_share_hist(str(tmp_path)).to_pandas()
    assert out.share_decile.tolist() == [7]
    assert out.n_orders.tolist() == [1]

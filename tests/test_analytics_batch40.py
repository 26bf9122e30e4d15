"""Batch 40: ship-span histogram, type loyalty, active-month coverage,
co-occurrence degrees."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_ship_span(ray_session, tmp_path):
    from ctdray.pipelines.analytics import order_ship_span_hist
    pq.write_table(pa.table({
        # order 1 spans 5 days; order 2 single-day
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_shipdate": pa.array([_ts("1995-01-01"), _ts("1995-01-06"),
                                _ts("1995-02-01")], pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = order_ship_span_hist(str(tmp_path)).to_pandas()
    got = dict(zip(out.span_days, out.n_orders))
    assert got == {5: 1, 0: 1}


def test_loyalty(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_type_loyalty
    pq.write_table(pa.table({
        "event_id": pa.array(range(4), pa.int64()),
        "ts": pa.array([_ts("2024-01-01")] * 4, pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "event_type": pa.array(["view", "view", "cart", "buy"]),
        "value": pa.array([0.0] * 4),
    }), str(tmp_path / "events.parquet"))
    out = user_type_loyalty(str(tmp_path)).to_pandas() \
        .set_index("user_id").sort_index()
    assert list(out.n_events) == [3, 1]
    assert list(out.loyalty_ppm) == [666_666, 1_000_000]


def test_active_months(ray_session, tmp_path):
    from ctdray.pipelines.analytics import supplier_active_months
    pq.write_table(pa.table({
        # supp 1: Jan + Mar -> 2 active over span 3 -> 666666 ppm
        "l_suppkey": pa.array([1, 1, 1], pa.int64()),
        "l_shipdate": pa.array([_ts("1995-01-10"), _ts("1995-03-05"),
                                _ts("1995-01-20")], pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = supplier_active_months(str(tmp_path)).to_pandas()
    assert (out.n_active_months[0], out.span_months[0],
            out.coverage_ppm[0]) == (2, 3, 666_666)


def test_cooccurrence_degree(ray_session, tmp_path):
    from ctdray.pipelines.analytics import token_cooccurrence_degree
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        # doc0: {a,b}; doc1: {b,c} -> degrees a=1, b=2, c=1
        "text": pa.array(["a b a", "b c"]),
    }), str(tmp_path / "documents.parquet"))
    out = token_cooccurrence_degree(str(tmp_path)).to_pandas()
    got = dict(zip(out.tok, out.degree))
    assert got == {"a": 1, "b": 2, "c": 1}

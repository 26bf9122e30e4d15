"""Label-centroid dot products, Q21-style last-ship supplier,
conjunctive multi-term retrieval, and weighted-histogram MAD — tiny
hand-built inputs pin the exact semantics the DuckDB oracles verify at
driver scale."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_label_centroid_dots_exact_integer_sums(ray_session, tmp_path):
    from ctdray.pipelines.analytics import label_centroid_dots
    # 64-dim vectors, only dims 0/1 nonzero for hand-checkable dots
    def vec(a, b):
        v = np.zeros(64)
        v[0], v[1] = a, b
        return v
    pq.write_table(pa.table({
        "embedding": pa.array([vec(0.1, 0.2).tolist(),
                               vec(0.3, 0.0).tolist(),
                               vec(0.0, 0.5).tolist()],
                              pa.list_(pa.float64())),
        "label": pa.array([1, 1, 2], pa.int64()),
    }), str(tmp_path / "embeddings.parquet"))
    out = label_centroid_dots(str(tmp_path)).to_pandas()
    got = {(a, b): d
           for a, b, d in zip(out.label_a, out.label_b, out["dot"])}
    # label 1 sum = (4000, 2000); label 2 sum = (0, 5000)
    assert got[(1, 1)] == 4000 * 4000 + 2000 * 2000
    assert got[(1, 2)] == 2000 * 5000
    assert got[(2, 2)] == 5000 * 5000
    assert set(got) == {(1, 1), (1, 2), (2, 2)}


def test_q21_last_ship_supplier_argmax_and_multisupp(ray_session, tmp_path):
    from ctdray.pipelines.analytics import q21_last_ship_supplier
    pq.write_table(pa.table({
        # order 1: supps 10, 20 — supp 20 ships last -> counted
        # order 2: single supplier -> excluded
        # order 3: supps 10, 30 tie on max date -> smaller suppkey 10 wins
        "l_orderkey": pa.array([1, 1, 1, 2, 3, 3], pa.int64()),
        "l_suppkey": pa.array([10, 20, 10, 10, 30, 10], pa.int64()),
        "l_shipdate": pa.array(
            [_ts("1995-01-01"), _ts("1995-03-01"), _ts("1995-02-01"),
             _ts("1995-01-01"), _ts("1995-05-05"), _ts("1995-05-05")],
            pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = q21_last_ship_supplier(str(tmp_path)).to_pandas()
    got = dict(zip(out.l_suppkey, out.n_last_ship_orders))
    assert got == {20: 1, 10: 1}


def test_docs_matching_all_terms_whole_token_and(ray_session, tmp_path):
    from ctdray.pipelines.analytics import docs_matching_all_terms
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        # doc 1 has all three; doc 2 misses 'value'; doc 3 has 'tables'
        # (not the whole token 'table'); doc 4 has terms at the edges
        "text": pa.array(["table query value x", "table query x",
                          "tables query value", "value x table y query"]),
    }), str(tmp_path / "documents.parquet"))
    out = docs_matching_all_terms(str(tmp_path)).to_pandas()
    assert sorted(out.doc_id) == [1, 4]


def test_value_mad_by_event_type_weighted_median(ray_session, tmp_path):
    from ctdray.pipelines.analytics import value_mad_by_event_type
    pq.write_table(pa.table({
        # type a values: 1.00 2.00 2.00 9.00 -> lower median 2.00 (200)
        #   |x-200|: 100 0 0 700 -> sorted 0 0 100 700 -> lower median 0
        # type b values: 1.00 5.00 -> lower median 100; |x-100|: 0 400 -> 0
        "event_type": pa.array(["a", "a", "a", "a", "b", "b"]),
        "value": pa.array([1.0, 2.0, 2.0, 9.0, 1.0, 5.0]),
    }), str(tmp_path / "events.parquet"))
    out = value_mad_by_event_type(str(tmp_path)).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    assert list(out.event_type) == ["a", "b"]
    assert list(out.median_cents) == [200, 100]
    assert list(out.mad_cents) == [0, 0]
    assert list(out.n_events) == [4, 2]


def test_value_mad_nonzero_mad(ray_session, tmp_path):
    from ctdray.pipelines.analytics import value_mad_by_event_type
    pq.write_table(pa.table({
        # values 1.00 3.00 6.00: median 300; devs 200 0 300 -> MAD 200
        "event_type": pa.array(["a", "a", "a"]),
        "value": pa.array([1.0, 3.0, 6.0]),
    }), str(tmp_path / "events.parquet"))
    out = value_mad_by_event_type(str(tmp_path)).to_pandas()
    assert list(out.median_cents) == [300]
    assert list(out.mad_cents) == [200]

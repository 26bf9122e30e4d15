"""Batch 76: boilerplate prefixes, segment staleness, LCC, core vocab
mass."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_boilerplate_prefix_docs(ray_session, tmp_path):
    from ctdray.pipelines.analytics import boilerplate_prefix_docs
    boiler = "dear customer hello extra words here"
    texts = [boiler + f" v{i}" for i in range(5)] + ["unique opening x"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(texts),
        "source": pa.array(["s1"] * 6),
    }), str(tmp_path / "documents.parquet"))
    out = boilerplate_prefix_docs(str(tmp_path)).to_pandas()
    assert out.n_docs[0] == 6
    assert out.n_flagged[0] == 5


def test_segment_staleness_matrix(ray_session, tmp_path):
    from ctdray.pipelines.analytics import segment_staleness_matrix
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_mktsegment": pa.array(["AUTO", "AUTO"]),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([1, 2], pa.int64()),
        # cust1 last 2001 (hot rel. to max), cust2 last 1996 (cold)
        "o_orderdate": pa.array([_ts("2001-01-01"), _ts("1996-01-01")],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    out = segment_staleness_matrix(str(tmp_path)).to_pandas() \
        .set_index(["segment", "tier"])
    assert out.loc[("AUTO", "hot")].n_customers == 1
    assert out.loc[("AUTO", "cold")].n_customers == 1


def test_coorder_largest_component(ray_session, tmp_path):
    from ctdray.pipelines.analytics import coorder_largest_component
    # order1 {1,2,3}; order2 {3,4}; order3 {10,11} -> comps {1..4},{10,11}
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 1, 2, 2, 3, 3], pa.int64()),
        "l_partkey": pa.array([1, 2, 3, 3, 4, 10, 11], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = coorder_largest_component(str(tmp_path)).to_pandas()
    assert out.n_nodes[0] == 6
    assert out.n_edges[0] == 5
    assert out.n_components[0] == 2
    assert out.lcc_size[0] == 4


def test_core_vocab_mass_ppm(ray_session, tmp_path):
    from ctdray.pipelines.analytics import core_vocab_mass_ppm
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        # "a" in both langs (core); b/c lang-specific.
        # occurrences: a x3, b x1, c x1 -> core mass 3/5
        "text": pa.array(["a a b", "a c"]),
        "lang": pa.array(["en", "de"]),
    }), str(tmp_path / "documents.parquet"))
    out = core_vocab_mass_ppm(str(tmp_path)).to_pandas()
    assert out.n_occurrences[0] == 5
    assert out.core_occurrences[0] == 3
    assert out.n_core_tokens[0] == 1
    assert out.core_mass_ppm[0] == 600_000

"""Batch 137: Condorcet audit, FOR encoding plan, vocab tiering,
LSM compaction plan."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_condorcet_nation_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import condorcet_nation_audit
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int32()),
        "n_name": pa.array(["N0", "N1", "N2"]),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_nationkey": pa.array([0, 0, 1, 2], pa.int32()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 3, 3, 4], pa.int64()),
        "o_totalprice": pa.array([10.0, 15.0, 15.0, 20.0]),
    }), str(tmp_path / "orders.parquet"))
    out = condorcet_nation_audit(str(tmp_path)).to_pandas()
    # rev N1>N2>N0, orders N1>(N0,N2 tie->key), cust N0>(N1,N2)
    assert list(map(tuple, out.values)) == [
        ("N0", 1, 0), ("N1", 2, 1), ("N2", 0, 0)]


def test_for_encoding_chunk_plan(ray_session, tmp_path):
    from ctdray.pipelines.analytics import for_encoding_chunk_plan
    pq.write_table(pa.table({
        "l_orderkey": pa.array([0, 3, 4, 5, 6, 8], pa.int64()),
        "l_partkey": pa.array([10, 12, 7, 7, 7, 100], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = for_encoding_chunk_plan(str(tmp_path), chunk=4).to_pandas()
    # chunk0 d=2(w2,n2,9B); chunk1 d=0(n3,8B); chunk2 d=0(n1,8B)
    assert list(map(tuple, out.values)) == [
        (0, 2, 4, 16), (2, 1, 2, 9)]


def test_vocab_tiering_plan(ray_session, tmp_path):
    from ctdray.pipelines.analytics import vocab_tiering_plan
    pq.write_table(pa.table({
        "text": pa.array(["a a a b b c c d"]),
    }), str(tmp_path / "documents.parquet"))
    out = vocab_tiering_plan(str(tmp_path), head=2).to_pandas()
    assert list(map(tuple, out.values)) == [
        ("head", 2, 5, 5), ("body", 1, 2, 4), ("tail", 1, 1, 2)]


def test_lsm_compaction_plan(ray_session, tmp_path):
    from ctdray.pipelines.analytics import lsm_compaction_plan
    pq.write_table(pa.table({
        "event_type": pa.array(["x"] * 5 + ["y"] * 4 + ["z"] * 9),
    }), str(tmp_path / "events.parquet"))
    out = lsm_compaction_plan(str(tmp_path), memtable=4,
                              ratio=2).to_pandas()
    assert list(map(tuple, out.values)) == [
        ("x", 5, 2, 1, 10), ("y", 4, 1, 0, 4), ("z", 9, 3, 2, 27)]

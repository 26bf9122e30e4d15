"""Batch 127: vocab growth checkpoints, bit-sliced sum, hash-table
probe costs, cuckoo choice loads."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_vocab_growth_checkpoints(ray_session, tmp_path):
    from ctdray.pipelines.analytics import vocab_growth_checkpoints
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 4], pa.int64()),
        "text": pa.array(["a b", "b c", "d"]),
    }), str(tmp_path / "documents.parquet"))
    out = vocab_growth_checkpoints(str(tmp_path)).to_pandas()
    # token mins: a,b -> 0; c -> 1; d -> 4
    assert list(map(tuple, out.values)) == [
        (0, 1, 2), (1, 2, 3), (2, 2, 3), (3, 3, 4)]


def test_bitsliced_sum_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import bitsliced_sum_audit
    pq.write_table(pa.table({
        "l_quantity": pa.array([1.0, 3.0, 5.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = bitsliced_sum_audit(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (0, 3, 3), (1, 1, 2), (2, 1, 4), (3, 0, 0),
        (4, 0, 0), (5, 0, 0), (6, 0, 0)]


def test_hash_table_probe_cost_sweep(ray_session, tmp_path):
    from ctdray.pipelines.analytics import hash_table_probe_cost_sweep
    # md5 48-bit hashes of 1,2,3 mod 16 are 9,12,12 (one chain of 2)
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 2, 3, 3], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    out = hash_table_probe_cost_sweep(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (4, 16, 3, 2, 4), (6, 64, 3, 1, 3),
        (8, 256, 3, 1, 3), (10, 1024, 3, 1, 3)]


def test_cuckoo_choice_load_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import cuckoo_choice_load_audit
    # choices: 1 -> (202, 56), 2 -> (30, 141), 3 -> (203, 126):
    # six distinct buckets of load 1, no hard keys
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2, 3, 1], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = cuckoo_choice_load_audit(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (-1, 0), (0, 250), (1, 6)]

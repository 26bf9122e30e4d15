"""Batch 142: buddy fragmentation, Good-Turing mass, WSJF audit,
sign-partition cut."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_buddy_allocation_frag_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import \
        buddy_allocation_frag_census
    keys = [1] + [2] * 3 + [3] * 4 + [4] * 5
    pq.write_table(pa.table({
        "l_orderkey": pa.array(keys, pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = buddy_allocation_frag_census(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (1, 1, 1, 0), (4, 2, 7, 1), (8, 1, 5, 3)]


def test_good_turing_unseen_mass(ray_session, tmp_path):
    from ctdray.pipelines.analytics import good_turing_unseen_mass
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_mktsegment": pa.array(["A", "A", "B"]),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 2, 2, 2, 3], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    out = good_turing_unseen_mass(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        ("A", 4, 1, 250000), ("B", 1, 1, 1000000)]


def test_wsjf_schedule_cost_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import wsjf_schedule_cost_audit
    d1 = _ts("2024-01-01T00:00")
    d2 = _ts("2024-01-02T00:00")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_orderdate": pa.array([d1, d1, d1, d2],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([3.0, 1.0, 0.5, 9.9]),
        "o_orderpriority": pa.array(["1-URGENT", "3-MEDIUM",
                                     "5-LOW", "2-HIGH"]),
    }), str(tmp_path / "orders.parquet"))
    out = wsjf_schedule_cost_audit(str(tmp_path)).to_pandas()
    # fifo 1500+1200+450; wsjf order k2,k3,k1 -> 300+150+2250
    assert list(map(tuple, out.values)) == [
        ("fifo", 3, 3150), ("wsjf", 3, 2700)]


def test_sign_partition_cut_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import sign_partition_cut_audit
    emb = [[0.5, 0.0], [-0.5, 0.0], [-0.1, 0.0], [0.2, 0.0]]
    pq.write_table(pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array(emb, pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))
    out = sign_partition_cut_audit(str(tmp_path)).to_pandas()
    # signs 1,0,0,1 cross twice; md5 bits 1,0,0,0 cross once
    assert list(map(tuple, out.values)) == [
        ("dim0_sign", 3, 2), ("md5", 3, 1)]

"""Batch 56: power iteration, drill-down top-k, consistent-hash audit."""
import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_embedding_power_iteration(ray_session, tmp_path):
    from ctdray.pipelines.analytics import embedding_power_iteration
    vecs = np.zeros((4, 64), dtype=np.float32)
    vecs[:, 0] = [1.0, 1.0, 1.0, 1.0]   # dominant direction = dim 0
    vecs[:2, 1] = 0.1
    pq.write_table(pa.table({
        "vec_id": pa.array(range(4), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array([0] * 4, pa.int32())}),
        str(tmp_path / "embeddings.parquet"))
    out = embedding_power_iteration(str(tmp_path)).to_pandas() \
        .set_index("dim").sort_index()
    assert out.loc[0].v == 100              # dominant dim saturates
    assert abs(out.loc[1].v) < 100
    assert (out.v[2:] == 0).all()

    # mirror the fixed-point iteration in numpy as an independent oracle
    q = np.rint(vecs.astype(np.float64) * 10_000).astype(np.int64)
    a = (q.T @ q).astype(object)
    v = np.full(64, 1, dtype=object)
    for _ in range(3):
        av = a @ v
        mx = max(int(abs(x)) for x in av)
        v = np.array([(100 * int(x)) // mx for x in av], dtype=object)
    assert list(out.v) == [int(x) for x in v]


def test_top_customer_part_drilldown(ray_session, tmp_path):
    from ctdray.pipelines.analytics import top_customer_part_drilldown
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([7, 8], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "l_partkey": pa.array([10, 11, 12, 13, 10], pa.int64()),
        "l_extendedprice": pa.array([40.0, 30.0, 20.0, 10.0, 5.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = top_customer_part_drilldown(
        str(tmp_path), n_cust=1, n_parts=3).to_pandas()
    assert set(out.o_custkey) == {7}
    assert list(out.l_partkey) == [10, 11, 12]
    assert list(out.part_rank) == [1, 2, 3]


def test_consistent_hash_move_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import consistent_hash_move_audit
    ids = list(range(40))
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64())}),
        str(tmp_path / "documents.parquet"))
    out = consistent_hash_move_audit(str(tmp_path)).to_pandas()
    exp_mod = sum(1 for d in ids if d % 16 != d % 17)
    exp_rdv = 0
    for d in ids:
        ws = [int(hashlib.md5(f"{d}|{n}".encode()).hexdigest()[:15], 16)
              for n in range(17)]
        old = max(range(16), key=lambda n: (ws[n], n))
        new = max(range(17), key=lambda n: (ws[n], n))
        exp_rdv += old != new
    assert out.n_docs[0] == 40
    assert out.moved_mod[0] == exp_mod
    assert out.moved_rendezvous[0] == exp_rdv
    # rendezvous must move strictly fewer docs than modulo
    assert out.moved_rendezvous[0] < out.moved_mod[0]

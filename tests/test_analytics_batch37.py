"""Batch 37: global gap top-k without global sort, source vocabulary
Jaccard, CR4 concentration."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_global_gaps_cross_bucket(ray_session, tmp_path):
    from ctdray.pipelines.analytics import global_event_gap_topk
    times = ["2024-01-01T00:00:00", "2024-01-01T00:10:00",  # 10m gap
             "2024-01-01T03:00:00",                          # 2h50m gap
             "2024-01-01T03:00:30"]                          # 30s gap
    pq.write_table(pa.table({
        "event_id": pa.array(range(4), pa.int64()),
        "ts": pa.array([_ts(t) for t in times], pa.timestamp("us")),
        "user_id": pa.array([0] * 4, pa.int64()),
        "event_type": pa.array(["x"] * 4),
        "value": pa.array([0.0] * 4),
    }), str(tmp_path / "events.parquet"))
    out = global_event_gap_topk(str(tmp_path), n=3).to_pandas()
    gaps_min = [g // 60_000_000 for g in out.gap_us]
    assert gaps_min == [170, 10, 0]
    assert out.start_ts[0] == np.datetime64("2024-01-01T00:10:00", "us")


def test_source_jaccard(ray_session, tmp_path):
    from ctdray.pipelines.analytics import source_vocab_jaccard
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a b c", "b c d", "x y"]),
        "source": pa.array(["s1", "s2", "s3"]),
    }), str(tmp_path / "documents.parquet"))
    out = source_vocab_jaccard(str(tmp_path)).to_pandas()
    got = {(a, b): (i, u) for a, b, i, u in
           zip(out.source_a, out.source_b, out.inter_size,
               out.union_size)}
    # s1={a,b,c}, s2={b,c,d}: inter 2, union 4; s3 disjoint -> absent
    assert got == {("s1", "s2"): (2, 4)}


def test_cr4(ray_session, tmp_path):
    from ctdray.pipelines.analytics import nation_cr4_ppm
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "s_nationkey": pa.array([0] * 5, pa.int64()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0], pa.int64()),
        "n_name": pa.array(["N"]),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        # revenues 5,4,3,2,1 -> top4 = 14 of 15 -> 933333 ppm
        "l_suppkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "l_extendedprice": pa.array([5.0, 4.0, 3.0, 2.0, 1.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = nation_cr4_ppm(str(tmp_path)).to_pandas()
    assert out.cr4_ppm[0] == (1_000_000 * 1400) // 1500
    assert out.n_suppliers[0] == 5

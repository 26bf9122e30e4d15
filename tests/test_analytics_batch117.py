"""Batch 117: percolation curve, vocab LCP profile, Haar energy,
dow rank occupancy."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_coorder_percolation_curve(ray_session, tmp_path):
    from ctdray.pipelines.analytics import coorder_percolation_curve
    # edge 1-2 weight 2, edge 2-3 weight 1, edge 4-5 weight 3
    ok = [10, 10, 11, 11, 12, 12, 20, 20, 21, 21, 22, 22]
    pk = [1, 2, 1, 2, 2, 3, 4, 5, 4, 5, 4, 5]
    pq.write_table(pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_partkey": pa.array(pk, pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = coorder_percolation_curve(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (2, 4, 2, 2), (3, 2, 1, 2), (4, 0, 0, 0), (5, 0, 0, 0)]


def test_vocab_adjacent_lcp_profile(ray_session, tmp_path):
    from ctdray.pipelines.analytics import vocab_adjacent_lcp_profile
    # sorted vocab [aa, ab, b]: pair LCPs are 1 and 0
    pq.write_table(pa.table({
        "text": pa.array(["aa ab", "b aa"]),
    }), str(tmp_path / "documents.parquet"))
    out = vocab_adjacent_lcp_profile(str(tmp_path)).to_pandas()
    assert out.l.tolist() == list(range(1, 9))
    assert out.n_pairs_ge.tolist() == [1, 0, 0, 0, 0, 0, 0, 0]


def test_daily_revenue_haar_energy(ray_session, tmp_path):
    from ctdray.pipelines.analytics import daily_revenue_haar_energy
    # cents 1000, 2000, 3000, 5000: level-1 energy 1e6 + 4e6;
    # level-2 sums [3000, 8000] -> energy 25e6; level 3 empty
    pq.write_table(pa.table({
        "o_orderdate": pa.array([_ts(f"1995-01-0{d}")
                                 for d in range(1, 5)],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([10.0, 20.0, 30.0, 50.0]),
    }), str(tmp_path / "orders.parquet"))
    out = daily_revenue_haar_energy(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (1, 2, 0, "5000000"), (2, 1, 0, "25000000"), (3, 0, 0, "0")]


def test_dow_rank_occupancy_matrix(ray_session, tmp_path):
    from ctdray.pipelines.analytics import dow_rank_occupancy_matrix
    # week 1: Tue (20) outranks Mon (10); week 2: lone Wed is rank 1
    pq.write_table(pa.table({
        "o_orderdate": pa.array([_ts("2024-01-01"), _ts("2024-01-02"),
                                 _ts("2024-01-10")],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([0.10, 0.20, 0.30]),
    }), str(tmp_path / "orders.parquet"))
    out = dow_rank_occupancy_matrix(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (1, 2, 1), (2, 1, 1), (3, 1, 1)]

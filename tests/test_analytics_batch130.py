"""Batch 130: Feistel shuffle, top-k overlap curve, weighted
bottom-k sample, natural sort runs."""
import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_feistel_shuffle_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import feistel_shuffle_audit
    # feistel(1) = 2175944765, feistel(2) = 4274136728: both
    # displacements are 32-bit; 2 distinct outputs
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 1], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    out = feistel_shuffle_audit(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(-1, 2), (32, 2)]


def _half(d):
    return int(hashlib.md5(str(d).encode()).hexdigest()[:2], 16) % 2


def test_topk_overlap_curve(ray_session, tmp_path):
    from ctdray.pipelines.analytics import topk_overlap_curve
    d0 = next(d for d in range(100) if _half(d) == 0)
    d1 = next(d for d in range(100) if _half(d) == 1)
    # half0 top = [a, b]; half1 top = [a, c] -> overlap 1 everywhere
    pq.write_table(pa.table({
        "doc_id": pa.array([d0, d1], pa.int64()),
        "text": pa.array(["a a b", "a c"]),
    }), str(tmp_path / "documents.parquet"))
    out = topk_overlap_curve(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (d, 1) for d in range(1, 21)]


def test_weighted_bottomk_sample(ray_session, tmp_path):
    from ctdray.pipelines.analytics import weighted_bottomk_sample
    # spends: 1 -> 100, 2 -> 300, 3 -> 200; priorities
    # 33015895600000, 11191462016666, 19863890550000
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 2, 3, 2], pa.int64()),
        "o_totalprice": pa.array([1.00, 2.00, 2.00, 1.00]),
    }), str(tmp_path / "orders.parquet"))
    out = weighted_bottomk_sample(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (1, 2, 300, 11_191_462_016_666),
        (2, 3, 200, 19_863_890_550_000),
        (3, 1, 100, 33_015_895_600_000)]


def test_natural_sort_run_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import natural_sort_run_census
    # storage order values 05, 03 | 02, 04 -> runs 2 + 1, no stitch
    pq.write_table(pa.table({
        "l_orderkey": pa.array([0, 0, 512, 512], pa.int64()),
        "l_linenumber": pa.array([1, 2, 1, 1], pa.int64()),
        "l_shipdate": pa.array([_ts("1995-01-05"), _ts("1995-01-03"),
                                _ts("1995-01-04"), _ts("1995-01-02")],
                               pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = natural_sort_run_census(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(4, 3)]

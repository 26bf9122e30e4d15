"""Batch 125: Theil-Sen slopes, Chao1 estimator, TA stop depth,
product-quantization census."""
import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_theilsen_slope_ppm_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import theilsen_slope_ppm_hist
    # monthly revenue cents 100, 250, 99, 99 -> 6 pairwise slopes;
    # (1,4) = -1e6/3 exercises Python-floor on a negative slope
    pq.write_table(pa.table({
        "o_orderdate": pa.array([_ts("2024-01-05"), _ts("2024-02-05"),
                                 _ts("2024-03-05"), _ts("2024-04-05")],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([1.00, 2.50, 0.99, 0.99]),
    }), str(tmp_path / "orders.parquet"))
    out = theilsen_slope_ppm_hist(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (-151_000_000, 1), (-75_500_000, 1), (-500_000, 1),
        (-333_334, 1), (0, 1), (150_000_000, 1)]


def _sampled(e):
    return int(hashlib.md5(str(e).encode()).hexdigest()[:2],
               16) % 8 == 0


def test_chao1_distinct_estimator(ray_session, tmp_path):
    from ctdray.pipelines.analytics import chao1_distinct_estimator
    hits = [e for e in range(3000) if _sampled(e)][:3]
    miss = [e for e in range(3000) if not _sampled(e)][:1]
    # u1,u2,u3 each one sampled event (f1=3); u4 unsampled ->
    # n_exact=4, d=3, f1=3, f2=0, est = 3 + 3*2//2 = 6
    pq.write_table(pa.table({
        "event_id": pa.array(hits + miss, pa.int64()),
        "user_id": pa.array([1, 2, 3, 4], pa.int64()),
    }), str(tmp_path / "events.parquet"))
    out = chao1_distinct_estimator(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(4, 3, 3, 0, 6)]


def test_ta_topk_stop_depth(ray_session, tmp_path):
    from ctdray.pipelines.analytics import ta_topk_stop_depth
    # 12 identical customers (spend 100, 1 order, score 1100):
    # threshold is 1100 at every depth; the heap fills at depth 10
    pq.write_table(pa.table({
        "o_custkey": pa.array(list(range(1, 13)), pa.int64()),
        "o_totalprice": pa.array([1.00] * 12),
    }), str(tmp_path / "orders.parquet"))
    out = ta_topk_stop_depth(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(10, 10, 1100, 1100, 10)]


def test_pq2_block_assignment_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import pq2_block_assignment_census
    # centroids: vec0 = 0, vec1 = 0.10 (q=10); vec2 at q=2 -> c0
    # (distortion 8*4), vec3 at q=8 -> c1 (8*4)
    vecs = [np.zeros(64), np.full(64, 0.10),
            np.full(64, 0.02), np.full(64, 0.08)]
    pq.write_table(pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array([v.astype(np.float32) for v in vecs],
                              pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))
    out = pq2_block_assignment_census(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (b, 2, 2, 64) for b in range(8)]

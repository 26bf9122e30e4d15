"""Batch 126: dictionary-encoding planner, checkpoint cadences,
sample-sort splitters, median-of-medians pivot rank."""
import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_dict_encoding_planner(ray_session, tmp_path):
    from ctdray.pipelines.analytics import dict_encoding_planner
    pq.write_table(pa.table({
        "p_brand": pa.array(["BRAND#11"] * 3),
        "p_type": pa.array(["x", "y", "x"]),
        "p_name": pa.array(["alpha one", "beta two", "gamma three"]),
    }), str(tmp_path / "part.parquet"))
    out = dict_encoding_planner(str(tmp_path)).to_pandas()
    # brand: plain 24 vs dict 8+6 -> dict; name: 28 vs 34 -> plain;
    # type: 3 vs 8 -> plain
    assert list(map(tuple, out.values)) == [
        ("p_brand", 3, 1, 24, 14, 1),
        ("p_name", 3, 3, 28, 34, 0),
        ("p_type", 3, 2, 3, 8, 0)]


def test_checkpoint_cadence_plan(ray_session, tmp_path):
    from ctdray.pipelines.analytics import checkpoint_cadence_plan
    # day0 {1,2}, day1 {2}, day2 {3}; U=3
    pq.write_table(pa.table({
        "ts": pa.array([_ts("2024-01-01"), _ts("2024-01-01T05:00"),
                        _ts("2024-01-02"), _ts("2024-01-03")],
                       pa.timestamp("us")),
        "user_id": pa.array([1, 2, 2, 3], pa.int64()),
    }), str(tmp_path / "events.parquet"))
    out = checkpoint_cadence_plan(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (1, 3, 0, 9), (2, 2, 1, 7), (4, 1, 2, 5), (8, 1, 2, 5)]


def _s64(k):
    return int(hashlib.md5(str(k).encode()).hexdigest()[:2],
               16) % 64 == 0


def test_samplesort_splitter_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import samplesort_splitter_audit
    ks = [k for k in range(10_000) if _s64(k)][:2]
    us = [k for k in range(10_000) if not _s64(k)][:3]
    # sample = {100, 300} -> splitters [100]*7 + [300]*8
    pq.write_table(pa.table({
        "o_orderkey": pa.array(ks + us, pa.int64()),
        "o_totalprice": pa.array([1.00, 3.00, 0.50, 2.00, 4.00]),
    }), str(tmp_path / "orders.parquet"))
    out = samplesort_splitter_audit(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(0, 1), (7, 2), (15, 2)]


def test_median_of_medians_rank_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import median_of_medians_rank_audit
    # chunk0 median 40 (rank 4 of 8), chunk1 median 100 (rank 2 of
    # 3); pivot = lower median of [40, 100] = 40
    cents = [10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110]
    pq.write_table(pa.table({
        "o_orderkey": pa.array(list(range(11)), pa.int64()),
        "o_totalprice": pa.array([c / 100 for c in cents]),
    }), str(tmp_path / "orders.parquet"))
    out = median_of_medians_rank_audit(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(40, 3, 1, 11, 272727)]

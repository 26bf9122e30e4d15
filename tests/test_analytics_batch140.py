"""Batch 140: Gray-code hamming census, predicate ordering,
(s,S) inventory replay, md5 permutation test."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_graycode_hamming_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import graycode_hamming_census
    pq.write_table(pa.table({
        "o_orderkey": pa.array([0, 1, 2, 3, 2], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    out = graycode_hamming_census(str(tmp_path)).to_pandas()
    # binary flips 1,2,1; gray flips 1,1,1
    assert sorted(map(tuple, out.values)) == [
        ("binary", 1, 2), ("binary", 2, 1), ("gray", 1, 3)]


def test_predicate_order_cost_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import predicate_order_cost_audit
    pq.write_table(pa.table({
        "l_quantity": pa.array([30.0, 30.0, 10.0, 10.0]),
        "l_discount": pa.array([0.06, 0.00, 0.06, 0.00]),
        "l_returnflag": pa.array(["R", "N", "R", "N"]),
    }), str(tmp_path / "lineitem.parquet"))
    out = predicate_order_cost_audit(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        ("ABC", 7, 1), ("ACB", 7, 0), ("BAC", 7, 0),
        ("BCA", 8, 0), ("CAB", 7, 0), ("CBA", 8, 0)]


def test_reorder_point_stockout_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import \
        reorder_point_stockout_census
    dates = [_ts("2024-01-01T00:00")] * 2 \
        + [_ts("2024-01-03T00:00")] * 5
    pq.write_table(pa.table({
        "o_orderdate": pa.array(dates, pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    out = reorder_point_stockout_census(str(tmp_path)).to_pandas()
    # grid demand [2,0,5], mu=2, S=6: day3 stocks out then reorders
    assert list(map(tuple, out.values)) == [(3, 2, 2, 6, 1, 1, 6)]


def test_md5_permutation_test(ray_session, tmp_path):
    from ctdray.pipelines.analytics import md5_permutation_test
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "l_linenumber": pa.array([1, 2, 1, 2, 1], pa.int32()),
        "l_quantity": pa.array([10.0, 20.0, 30.0, 40.0, 5.0]),
        "l_returnflag": pa.array(["R", "N", "R", "N", "A"]),
    }), str(tmp_path / "lineitem.parquet"))
    out = md5_permutation_test(str(tmp_path)).to_pandas()
    # obs 40; perm stats 20,60,0,0,60,40,60,80 -> 5 of 8 >= obs
    assert list(map(tuple, out.values)) == [(40, 8, 5, 666666)]

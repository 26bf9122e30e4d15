"""Batch 113: AMS F2 sketch, next-higher wait, interval coverage,
RLE chunk audit."""
import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_ams_f2_sketch_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import ams_f2_sketch_audit
    # users 7 (3 events) and 9 (1 event): F2 = 9 + 1 = 10; signed
    # sums recomputed independently from the md5-parity rule
    pq.write_table(pa.table({
        "user_id": pa.array([7, 7, 7, 9], pa.int64()),
    }), str(tmp_path / "events.parquet"))
    out = ams_f2_sketch_audit(str(tmp_path)).to_pandas()
    assert out.f2_exact.tolist() == ["10"] * 4

    def sgn(r, u):
        h = int(hashlib.md5(f"{r}:{u}".encode()).hexdigest()[:15], 16)
        return 1 if h % 2 == 0 else -1

    for r in range(4):
        exp = sgn(r, 7) * 3 + sgn(r, 9) * 1
        assert out.signed_sum[r] == exp
        assert out.est_f2[r] == str(exp * exp)


def test_daily_revenue_next_higher_wait(ray_session, tmp_path):
    from ctdray.pipelines.analytics import daily_revenue_next_higher_wait
    # revs by day: 100, 50, 60, 200 -> waits 3, 1, 1, never
    pq.write_table(pa.table({
        "o_orderdate": pa.array([_ts("1995-01-01"), _ts("1995-01-02"),
                                 _ts("1995-01-03"), _ts("1995-01-04")],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([1.00, 0.50, 0.60, 2.00]),
    }), str(tmp_path / "orders.parquet"))
    out = daily_revenue_next_higher_wait(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(-1, 1), (1, 2), (3, 1)]


def test_supplier_ship_interval_coverage(ray_session, tmp_path):
    from ctdray.pipelines.analytics import supplier_ship_interval_coverage
    # supplier 1, one year: [d0,d2] U [d1,d3] = island of 4 days;
    # [d10,d11] = island of 2 -> cov 6, 2 islands, bucket 0.
    # The non-urgent order is excluded.
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "l_suppkey": pa.array([1, 1, 1, 1], pa.int64()),
        "l_shipdate": pa.array([_ts("1995-01-03"), _ts("1995-01-04"),
                                _ts("1995-01-12"), _ts("1995-06-01")],
                               pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_orderdate": pa.array([_ts("1995-01-01"), _ts("1995-01-02"),
                                 _ts("1995-01-11"), _ts("1995-05-01")],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT",
                                     "1-URGENT", "5-LOW"]),
    }), str(tmp_path / "orders.parquet"))
    out = supplier_ship_interval_coverage(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(0, 1, 2)]


def test_rle_chunk_encoding_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import rle_chunk_encoding_audit
    # chunk 0: states RO, RO, NF -> 2 runs / 3 rows -> ppm 666666
    # -> bucket 33; chunk 1 (okey 100): 1 run / 1 row -> bucket 50
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 100], pa.int64()),
        "l_linenumber": pa.array([1, 2, 1, 1], pa.int32()),
        "l_returnflag": pa.array(["R", "R", "N", "A"]),
        "l_linestatus": pa.array(["O", "O", "F", "F"]),
    }), str(tmp_path / "lineitem.parquet"))
    out = rle_chunk_encoding_audit(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(33, 1), (50, 1)]

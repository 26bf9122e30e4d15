"""Batch 51: zone-map overlap, weighted Jaccard, covariance by flag,
independence deviation."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_shipdate_zonemap_overlap(ray_session, tmp_path):
    from ctdray.pipelines.analytics import shipdate_zonemap_overlap
    # chunks 0,1,2 (orderkeys 0,1000,2000); envelopes:
    # c0=[jan1,jan10], c1=[jan5,jan6], c2=[feb1,feb1]
    # -> overlapping pairs: (0,1) only
    pq.write_table(pa.table({
        "l_orderkey": pa.array([0, 0, 1000, 1000, 2000], pa.int64()),
        "l_shipdate": pa.array([_ts("2024-01-01"), _ts("2024-01-10"),
                                _ts("2024-01-05"), _ts("2024-01-06"),
                                _ts("2024-02-01")], pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = shipdate_zonemap_overlap(str(tmp_path)).to_pandas()
    assert out.n_chunks[0] == 3
    assert out.n_overlapping_pairs[0] == 1
    assert out.overlap_ppm[0] == 333_333


def test_source_weighted_jaccard(ray_session, tmp_path):
    from ctdray.pipelines.analytics import source_weighted_jaccard
    # s1 tokens: a a b (a:2 b:1); s2: a b b c (a:1 b:2 c:1)
    # min: a1+b1 = 2 ; max = 3+4-2 = 5 -> 400000 ppm
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a a b", "a b b c"]),
        "source": pa.array(["s1", "s2"]),
    }), str(tmp_path / "documents.parquet"))
    out = source_weighted_jaccard(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert out.min_sum[0] == 2
    assert out.max_sum[0] == 5
    assert out.wjaccard_ppm[0] == 400_000


def test_qty_discount_cov_by_flag(ray_session, tmp_path):
    from ctdray.pipelines.analytics import qty_discount_cov_by_flag
    # flag A: (q,d) cents = (100,5), (300,10)
    # cov_num = 2*(500+3000) - 400*15 = 7000 - 6000 = 1000
    pq.write_table(pa.table({
        "l_returnflag": pa.array(["A", "A"]),
        "l_quantity": pa.array([1.0, 3.0]),
        "l_discount": pa.array([0.05, 0.10]),
    }), str(tmp_path / "lineitem.parquet"))
    out = qty_discount_cov_by_flag(str(tmp_path)).to_pandas()
    assert out.cov_num[0] == 1000
    assert out.sum_qd[0] == 3500


def test_priority_dow_independence(ray_session, tmp_path):
    from ctdray.pipelines.analytics import priority_dow_independence
    # Mon(1): P1 x2 ; Tue(2): P2 x2 -> perfectly dependent
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(4), pa.int64()),
        "o_orderdate": pa.array([_ts("2024-01-01")] * 2      # Monday
                                + [_ts("2024-01-02")] * 2,   # Tuesday
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["P1", "P1", "P2", "P2"]),
    }), str(tmp_path / "orders.parquet"))
    out = priority_dow_independence(str(tmp_path)).to_pandas() \
        .set_index(["dow", "priority"])
    # obs=2, total=4, row=2, col=2 -> dev = 8 - 4 = 4
    assert out.loc[(1, "P1")].dev_num == 4
    assert out.loc[(2, "P2")].dev_num == 4

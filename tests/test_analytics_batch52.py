"""Batch 52: same-month ship share, L1 drift, exact KS statistic,
dedup survivorship."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_same_month_ship_share(ray_session, tmp_path):
    from ctdray.pipelines.analytics import same_month_ship_share_by_year
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array([_ts("1995-03-10"), _ts("1995-06-01")],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        # order 1: one line same month, one next month; order 2: same
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_shipdate": pa.array([_ts("1995-03-20"), _ts("1995-04-02"),
                                _ts("1995-06-30")], pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = same_month_ship_share_by_year(str(tmp_path)).to_pandas()
    assert out.n_lines[0] == 3
    assert out.n_same_month[0] == 2
    assert out.same_month_ppm[0] == 666_666


def test_priority_value_drift_l1(ray_session, tmp_path):
    from ctdray.pipelines.analytics import priority_value_drift_l1
    # P1: before -> 2 orders in bucket 6 (cents 100); after -> 1 order
    # in bucket 7 (cents 128). l1 = |2*1-0*2| + |0*1-1*2| = 4
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(3), pa.int64()),
        "o_orderdate": pa.array([_ts("1995-01-01"), _ts("1996-01-01"),
                                 _ts("1999-01-01")], pa.timestamp("us")),
        "o_orderpriority": pa.array(["P1"] * 3),
        "o_totalprice": pa.array([1.0, 1.0, 1.28]),
    }), str(tmp_path / "orders.parquet"))
    out = priority_value_drift_l1(str(tmp_path)).to_pandas()
    assert out.n_before[0] == 2
    assert out.n_after[0] == 1
    assert out.l1_num[0] == 4


def test_quantity_ks_between_flags(ray_session, tmp_path):
    from ctdray.pipelines.analytics import quantity_ks_between_flags
    # A: q = 1, 2 ; R: q = 2, 2 -> at v=100: |1*2 - 0*2| = 2;
    # at v=200: |2*2 - 2*2| = 0 -> ks_num = 2 (den 4)
    pq.write_table(pa.table({
        "l_returnflag": pa.array(["A", "A", "R", "R", "N"]),
        "l_quantity": pa.array([1.0, 2.0, 2.0, 2.0, 9.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = quantity_ks_between_flags(str(tmp_path)).to_pandas()
    assert out.n_a[0] == 2 and out.n_b[0] == 2
    assert out.ks_num[0] == 2


def test_dedup_survivorship_stats(ray_session, tmp_path):
    from ctdray.pipelines.analytics import dedup_survivorship_stats
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        # docs 0,1 share text (0 kept, 1 dropped); doc 2 unique (kept)
        "text": pa.array(["aaaa", "aaaa", "bb"]),
    }), str(tmp_path / "documents.parquet"))
    out = dedup_survivorship_stats(str(tmp_path)).to_pandas() \
        .set_index("status")
    assert out.loc["kept"].n_docs == 2
    assert out.loc["kept"].total_chars == 6
    assert out.loc["dropped"].n_docs == 1
    assert out.loc["dropped"].total_chars == 4

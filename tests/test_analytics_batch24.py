"""Batch 24: char-class profile, Benford first digit, MoM growth,
bipartite degree histogram."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_char_class_counts(ray_session, tmp_path):
    from ctdray.pipelines.analytics import doc_char_class_profile
    pq.write_table(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["ab ee o"]),
    }), str(tmp_path / "documents.parquet"))
    out = doc_char_class_profile(str(tmp_path)).to_pandas()
    assert (out.n_letters[0], out.n_spaces[0], out.n_vowels[0]) == \
        (5, 2, 4)


def test_first_digit_exact(ray_session, tmp_path):
    from ctdray.pipelines.analytics import value_first_digit_hist
    pq.write_table(pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "ts": pa.array([_ts("2024-01-01")] * 5, pa.timestamp("us")),
        "user_id": pa.array([0] * 5, pa.int64()),
        "event_type": pa.array(["x"] * 5),
        # cents: 100, 999, 1000, 95, 0 (dropped)
        "value": pa.array([1.00, 9.99, 10.00, 0.95, 0.0]),
    }), str(tmp_path / "events.parquet"))
    out = value_first_digit_hist(str(tmp_path)).to_pandas() \
        .set_index("digit").sort_index()
    assert dict(out.n) == {1: 2, 9: 2}
    assert out.min_cents[1] == 100 and out.max_cents[1] == 1000


def test_mom_growth(ray_session, tmp_path):
    from ctdray.pipelines.analytics import monthly_revenue_growth_ppm
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(3), pa.int64()),
        "o_orderdate": pa.array([_ts("1995-01-05"), _ts("1995-02-05"),
                                 _ts("1995-02-20")],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([10.0, 12.0, 3.0]),
    }), str(tmp_path / "orders.parquet"))
    out = monthly_revenue_growth_ppm(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert out.revenue_cents[0] == 1500 and out.prev_cents[0] == 1000
    assert out.growth_ppm[0] == 500_000


def test_degree_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import part_supplier_degree_hist
    pq.write_table(pa.table({
        # part 1: suppliers {10, 11}; part 2: {10}; part 3: {12}
        "l_partkey": pa.array([1, 1, 1, 2, 3], pa.int64()),
        "l_suppkey": pa.array([10, 11, 10, 10, 12], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = part_supplier_degree_hist(str(tmp_path)).to_pandas()
    got = dict(zip(out.n_suppliers, out.n_parts))
    assert got == {1: 2, 2: 1}

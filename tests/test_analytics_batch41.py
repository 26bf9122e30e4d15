"""Batch 41: preferred weekday distribution, adjacent repeats, customer
reach."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_preferred_dow(ray_session, tmp_path):
    from ctdray.pipelines.analytics import preferred_order_dow_dist
    # 1995-01-02 = Monday (dow 1); 1995-01-03 = Tuesday (dow 2)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(4), pa.int64()),
        "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
        # cust 1: 2 Mondays 1 Tuesday -> Monday; cust 2: Tuesday
        "o_orderdate": pa.array(
            [_ts("1995-01-02"), _ts("1995-01-09"), _ts("1995-01-03"),
             _ts("1995-01-03")], pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    out = preferred_order_dow_dist(str(tmp_path)).to_pandas()
    got = dict(zip(out.preferred_dow, out.n_customers))
    assert got == {1: 1, 2: 1}


def test_adjacent_repeats(ray_session, tmp_path):
    from ctdray.pipelines.analytics import doc_adjacent_repeat_counts
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a a b b b", "x y"]),
    }), str(tmp_path / "documents.parquet"))
    out = doc_adjacent_repeat_counts(str(tmp_path)).to_pandas() \
        .set_index("doc_id").sort_index()
    assert list(out.n_adjacent_repeats) == [3, 0]
    assert list(out.n_tokens) == [5, 2]


def test_reach(ray_session, tmp_path):
    from ctdray.pipelines.analytics import nation_customer_reach
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0], pa.int64()),
        "n_name": pa.array(["N"]),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_nationkey": pa.array([0, 0, 0, 0], pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11], pa.int64()),
        "o_custkey": pa.array([1, 3], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    out = nation_customer_reach(str(tmp_path)).to_pandas()
    assert (out.n_active[0], out.n_customers[0],
            out.reach_ppm[0]) == (2, 4, 500_000)

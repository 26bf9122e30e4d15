"""Batch 32: Gini ppm, year overlap matrix, funnel lag histogram, Zipf
ranks."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_gini_extremes(ray_session, tmp_path):
    from ctdray.pipelines.analytics import part_revenue_gini_ppm
    # perfectly equal revenues -> gini 0
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2, 3, 4], pa.int64()),
        "l_extendedprice": pa.array([5.0, 5.0, 5.0, 5.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = part_revenue_gini_ppm(str(tmp_path)).to_pandas()
    assert out.gini_ppm[0] == 0 and out.n_parts[0] == 4
    # one part owns everything -> gini = (n-1)/n = 750000 ppm
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2, 3, 4], pa.int64()),
        "l_extendedprice": pa.array([0.0, 0.0, 0.0, 20.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = part_revenue_gini_ppm(str(tmp_path)).to_pandas()
    assert out.gini_ppm[0] == 750_000


def test_year_overlap(ray_session, tmp_path):
    from ctdray.pipelines.analytics import customer_year_overlap_matrix
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(4), pa.int64()),
        "o_custkey": pa.array([1, 1, 2, 2], pa.int64()),
        # cust 1 active 1995+1996; cust 2 only 1995
        "o_orderdate": pa.array([_ts("1995-02-01"), _ts("1996-02-01"),
                                 _ts("1995-03-01"), _ts("1995-07-01")],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    out = customer_year_overlap_matrix(str(tmp_path)).to_pandas()
    got = {(a, b): n for a, b, n in zip(out.year_a, out.year_b,
                                        out.n_customers)}
    assert got == {(1995, 1995): 2, (1995, 1996): 1, (1996, 1996): 1}


def test_funnel_lag(ray_session, tmp_path):
    from ctdray.pipelines.analytics import view_to_purchase_lag_hist
    pq.write_table(pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "ts": pa.array([
            _ts("2024-01-01T00:00"),   # u1 first view
            _ts("2024-01-01T00:30"),   # u1 purchase (lag 30min -> b0)
            _ts("2024-01-01T02:00"),   # u2 view
            _ts("2024-01-01T03:30"),   # u2 purchase (90min -> b1)
            _ts("2024-01-01T00:00"),   # u3 purchase only -> excluded
        ], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "event_type": pa.array(["view", "purchase", "view", "purchase",
                                "purchase"]),
        "value": pa.array([0.0] * 5),
    }), str(tmp_path / "events.parquet"))
    out = view_to_purchase_lag_hist(str(tmp_path)).to_pandas()
    got = dict(zip(out.lag_bucket, out.n_users))
    assert got == {0: 1, 1: 1}


def test_zipf_ranks(ray_session, tmp_path):
    from ctdray.pipelines.analytics import token_zipf_ranks
    pq.write_table(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["b b b a a c"]),
    }), str(tmp_path / "documents.parquet"))
    out = token_zipf_ranks(str(tmp_path)).to_pandas()
    assert list(out.tok) == ["b", "a", "c"]
    assert list(out.freq_rank) == [1, 2, 3]
    assert list(out.n_occurrences) == [3, 2, 1]

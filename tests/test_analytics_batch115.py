"""Batch 115: histogram quantile audit, trie level widths, Gorilla
audit, dow detrend sign census."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_histogram_quantile_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import histogram_quantile_audit
    # cents 100..1000 step 100 (N=10): lo=100, width=4.
    # p50: k=5, exact 500, bucket 100 -> est 503; p90: k=9, exact
    # 900 -> est 903; p99: k=10, exact 1000 -> est 1003
    pq.write_table(pa.table({
        "l_extendedprice": pa.array([float(i) for i in range(1, 11)]),
    }), str(tmp_path / "lineitem.parquet"))
    out = histogram_quantile_audit(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (50, 503, 500, 3), (90, 903, 900, 3), (99, 1003, 1000, 3)]


def test_token_trie_level_widths(ray_session, tmp_path):
    from ctdray.pipelines.analytics import token_trie_level_widths
    # vocab {ab, ac, b}: level 1 -> {a, b}; levels 2-4 -> 3 prefixes
    pq.write_table(pa.table({
        "text": pa.array(["ab ac", "b ab"]),
    }), str(tmp_path / "documents.parquet"))
    out = token_trie_level_widths(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (1, 2), (2, 3), (3, 3), (4, 3)]


def test_daily_revenue_gorilla_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import daily_revenue_gorilla_audit
    # cents 1000, 2000, 3000, 5000: d1 = [1000, 1000, 2000] (zigzag
    # 2000/2000/4000 -> 2+2+2 = 6 bytes), d2 = [0, 1000] (1 + 2 = 3)
    pq.write_table(pa.table({
        "o_orderdate": pa.array([_ts(f"1995-01-0{d}")
                                 for d in range(1, 5)],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([10.0, 20.0, 30.0, 50.0]),
    }), str(tmp_path / "orders.parquet"))
    out = daily_revenue_gorilla_audit(str(tmp_path)).to_pandas()
    assert out.n_days[0] == 4 and out.n_second_diffs[0] == 2
    assert out.n_zero_d2[0] == 1
    assert out.varint_bytes_d1[0] == 6
    assert out.varint_bytes_d2[0] == 3


def test_dow_detrend_sign_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import dow_detrend_sign_census
    # two Mondays (10, 20 cents): one above / one below the Monday
    # mean; one Tuesday: exactly at its own mean
    pq.write_table(pa.table({
        "o_orderdate": pa.array([_ts("2024-01-01"), _ts("2024-01-08"),
                                 _ts("2024-01-02")],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([0.10, 0.20, 0.30]),
    }), str(tmp_path / "orders.parquet"))
    out = dow_detrend_sign_census(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (1, 1, 1, 0), (2, 0, 0, 1)]

"""Batch 118: interpolation-error audit, CDC chunk lengths, bag
algebra across years, source KS matrix."""
import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_price_interpolation_error_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import price_interpolation_error_hist
    # distinct cents [100, 200, 1000]: pred(200) = 200//900*2 = 0
    # but rank 1 -> err 1; endpoints exact
    pq.write_table(pa.table({
        "o_totalprice": pa.array([1.00, 2.00, 2.00, 10.00]),
    }), str(tmp_path / "orders.parquet"))
    out = price_interpolation_error_hist(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(0, 2), (1, 1)]


def _is_boundary(tok):
    return int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % 64 == 0


def test_cdc_chunk_length_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import cdc_chunk_length_hist
    # find one boundary token and two non-boundary tokens, then lay
    # out "x x B y": chunk of 3 ending at B, tail chunk of 1
    bnd = next(f"t{i}" for i in range(10000) if _is_boundary(f"t{i}"))
    plain = [f"p{i}" for i in range(10000)
             if not _is_boundary(f"p{i}")][:2]
    text = f"{plain[0]} {plain[0]} {bnd} {plain[1]}"
    pq.write_table(pa.table({"text": pa.array([text])}),
                   str(tmp_path / "documents.parquet"))
    out = cdc_chunk_length_hist(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(1, 1), (3, 1)]


def test_partkey_bag_algebra_years(ray_session, tmp_path):
    from ctdray.pipelines.analytics import partkey_bag_algebra_years
    # part 1: 2x in 1995, 1x in 1996 -> min 1, only95 1;
    # part 2: 2x in 1996 only -> only96 2
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "l_shipdate": pa.array([_ts("1995-03-01"), _ts("1995-06-01"),
                                _ts("1996-02-01"), _ts("1996-04-01"),
                                _ts("1996-05-01")],
                               pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_brand": pa.array(["BrandA", "BrandA"]),
    }), str(tmp_path / "part.parquet"))
    out = partkey_bag_algebra_years(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [("BrandA", 1, 1, 2, 2)]


def test_source_doclen_ks_matrix(ray_session, tmp_path):
    from ctdray.pipelines.analytics import source_doclen_ks_matrix
    # source a lengths [1, 2], source b [2, 2]:
    # sup |F_a*N_b - F_b*N_a| at v=1 is |1*2 - 0*2| = 2
    pq.write_table(pa.table({
        "source": pa.array(["a", "a", "b", "b"]),
        "n_chars": pa.array([1, 2, 2, 2], pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    out = source_doclen_ks_matrix(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [("a", "b", 2, 2, "2")]

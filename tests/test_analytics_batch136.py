"""Batch 136: int32-overflow day census, q-gram index planner,
minimizer density, hash-agg spill planner."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_int32_overflow_day_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import int32_overflow_day_census
    pq.write_table(pa.table({
        "l_returnflag": pa.array(["A", "A", "B"]),
        "l_shipdate": pa.array([_ts("1995-01-01T00:00"),
                                _ts("1995-01-02T00:00"),
                                _ts("1995-01-01T00:00")],
                               pa.timestamp("us")),
        "l_extendedprice": pa.array([20_000_000.0, 2_000_000.0,
                                     1.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = int32_overflow_day_census(str(tmp_path)).to_pandas()
    # A: 2.0e9 then 2.2e9 cents -> crosses int32 max on day 2
    assert list(map(tuple, out.values)) == [
        ("A", "1995-01-02", 1, 2_200_000_000),
        ("B", "", 0, 100)]


def test_kgram_index_size_planner(ray_session, tmp_path):
    from ctdray.pipelines.analytics import kgram_index_size_planner
    pq.write_table(pa.table({
        "text": pa.array(["ab abc abcd", "abc xyz"]),
    }), str(tmp_path / "documents.parquet"))
    out = kgram_index_size_planner(str(tmp_path)).to_pandas()
    # vocab {ab,abc,abcd,xyz}; grams abc:2 bcd:1 xyz:1
    assert list(map(tuple, out.values)) == [(4, 3, 4, 2)]


def test_doc_minimizer_density(ray_session, tmp_path):
    from ctdray.pipelines.analytics import doc_minimizer_density
    pq.write_table(pa.table({
        "doc_id": pa.array([4, 5, 8, 12], pa.int64()),
        "text": pa.array(["abcdabcdabcdabc", "ignored", "abc",
                          "abcdefgh"]),
    }), str(tmp_path / "documents.parquet"))
    out = doc_minimizer_density(str(tmp_path)).to_pandas()
    got = sorted(map(tuple, out.values))
    # doc 5 filtered (id % 4 != 0); doc 8 shorter than k
    assert got == [(4, 12, 5, 2), (8, 0, 0, 0), (12, 5, 1, 1)]


def test_hashagg_spill_planner(ray_session, tmp_path):
    from ctdray.pipelines.analytics import hashagg_spill_planner
    pq.write_table(pa.table({
        "l_returnflag": pa.array(["A", "A", "B"]),
        "l_linestatus": pa.array(["O", "O", "F"]),
        "l_partkey": pa.array([1, 2, 3], pa.int64()),
        "l_orderkey": pa.array([10, 10, 20], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = hashagg_spill_planner(str(tmp_path),
                                budget=200).to_pandas()
    assert list(map(tuple, out.values)) == [
        ("returnflag", 1, 2, 176, 1, 1),
        ("returnflag_linestatus", 2, 2, 192, 1, 1),
        ("partkey", 1, 3, 264, 0, 2),
        ("orderkey", 1, 2, 176, 1, 1)]

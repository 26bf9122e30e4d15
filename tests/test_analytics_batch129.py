"""Batch 129: rounding divergence, skip-list levels, BPE first
merge, Rice parameter selection."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_rounding_policy_divergence_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import \
        rounding_policy_divergence_census
    # prods 150 (half, q odd), 250 (half, q even -> divergent), 500
    pq.write_table(pa.table({
        "l_returnflag": pa.array(["A", "A", "A"]),
        "l_extendedprice": pa.array([1.50, 2.50, 1.00]),
        "l_discount": pa.array([0.01, 0.01, 0.05]),
    }), str(tmp_path / "lineitem.parquet"))
    out = rounding_policy_divergence_census(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [("A", 3, 2, 1)]


def test_skiplist_level_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import skiplist_level_census
    # 48-bit md5 hashes: key 1 is odd (level 0); keys 2 and 3 end
    # in ...100 (level 2)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 2], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    out = skiplist_level_census(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(0, 1), (2, 2)]


def test_bpe_first_merge_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import bpe_first_merge_audit
    pq.write_table(pa.table({
        "text": pa.array(["abab abab cd", "abab"]),
    }), str(tmp_path / "documents.parquet"))
    out = bpe_first_merge_audit(str(tmp_path)).to_pandas()
    # 'ab' appears twice per 'abab' x3 occurrences = 6
    assert list(map(tuple, out.values)) == [("ab", 6, 1, 3)]


def test_rice_parameter_selection(ray_session, tmp_path):
    from ctdray.pipelines.analytics import rice_parameter_selection
    # t in docs 0,1,9 -> gaps [1,1,8]: k=1 wins at 10 bits;
    # u in doc 0 -> gap [1]: k=0 ties k=1 at 2 bits -> k=0
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 9], pa.int64()),
        "text": pa.array(["t u", "t", "t"]),
    }), str(tmp_path / "documents.parquet"))
    out = rice_parameter_selection(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(0, 1, 2), (1, 1, 10)]

"""Batch 105: sorted-neighborhood pairs, unit-price divisibility,
shipdate monotonicity, token length by position."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_sorted_neighborhood_pair_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import sorted_neighborhood_pair_hist
    # block "a": docs sorted by text: "a b c" (1), "a b d" (2),
    # "a x y z" (3) -> pairs (1,2): inter {a,b}=2, union 4 -> dec 5;
    # (2,3): inter {a}=1, union 6 -> dec 1.
    # block "q": single doc -> no pair.
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a b c", "a b d", "a x y z", "q r"]),
    }), str(tmp_path / "documents.parquet"))
    out = sorted_neighborhood_pair_hist(str(tmp_path)).to_pandas()
    assert dict(zip(out.jaccard_decile, out.n_pairs)) == {1: 1, 5: 1}


def test_unitprice_divisibility_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import unitprice_divisibility_audit
    # flag A: 3 units at 3.00 -> 300 % 3 == 0 divisible;
    #         7 units at 1.00 -> 100 % 7 != 0 indivisible
    pq.write_table(pa.table({
        "l_returnflag": pa.array(["A", "A", "R"]),
        "l_quantity": pa.array([3.0, 7.0, 2.0]),
        "l_extendedprice": pa.array([3.0, 1.0, 5.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = unitprice_divisibility_audit(str(tmp_path)).to_pandas() \
        .set_index("l_returnflag")
    assert out.loc["A"].n_lines == 2
    assert out.loc["A"].n_indivisible == 1
    assert out.loc["R"].n_indivisible == 0


def test_order_shipdate_monotonicity(ray_session, tmp_path):
    from ctdray.pipelines.analytics import order_shipdate_monotonicity
    # order 1 (2 lines): ship dates increase -> monotone
    # order 2 (2 lines): line 2 ships before line 1 -> not monotone
    # order 3 (1 line): dropped
    ts = pa.array([_ts("1995-01-01"), _ts("1995-01-05"),
                   _ts("1995-02-02"), _ts("1995-02-01"),
                   _ts("1995-03-01")], pa.timestamp("us"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "l_linenumber": pa.array([1, 2, 1, 2, 1], pa.int64()),
        "l_shipdate": ts,
    }), str(tmp_path / "lineitem.parquet"))
    out = order_shipdate_monotonicity(str(tmp_path)).to_pandas()
    assert out.n_lines.tolist() == [2]
    assert out.n_orders.tolist() == [2]
    assert out.n_monotone.tolist() == [1]


def test_token_length_by_position(ray_session, tmp_path):
    from ctdray.pipelines.analytics import token_length_by_position
    # doc "aa b": positions 0,1 of n=2 -> deciles 0 and 5;
    # lengths 2 and 1
    pq.write_table(pa.table({
        "text": pa.array(["aa b"]),
    }), str(tmp_path / "documents.parquet"))
    out = token_length_by_position(str(tmp_path)).to_pandas()
    assert out.pos_decile.tolist() == [0, 5]
    assert out.len_sum.tolist() == [2, 1]
    assert out.n_tokens.tolist() == [1, 1]

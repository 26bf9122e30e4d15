"""Batch 112: greedy vocab cover, token-length lag sign census,
Kendall width x price, price-doubling pair histogram."""
import pyarrow as pa
import pyarrow.parquet as pq


def test_greedy_vocab_cover(ray_session, tmp_path):
    from ctdray.pipelines.analytics import greedy_vocab_cover
    # df: a=3, b=2, c=1, d=1 -> top order a,b,c,d.  Round 1 picks
    # doc 0 (covers a,b,c), round 2 doc 2 (covers d), round 3 is dry
    # (tie -> lowest doc_id = 0)
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a b c", "a b", "a d"]),
    }), str(tmp_path / "documents.parquet"))
    out = greedy_vocab_cover(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (1, 0, 3, 1), (2, 2, 1, 0), (3, 0, 0, 0)]


def test_doc_toklen_lag_sign_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import doc_toklen_lag_sign_census
    # "a bb a bb a": m=4, sxy=8, sx=6, sy=6 -> num=-4 (negative)
    # "a a bb bb": m=3, sxy=7, sx=4, sy=5 -> num=+1 (positive)
    # "a b" has <3 tokens -> excluded
    pq.write_table(pa.table({
        "text": pa.array(["a bb a bb a", "a a bb bb", "a b"]),
        "lang": pa.array(["en", "en", "en"]),
    }), str(tmp_path / "documents.parquet"))
    out = doc_toklen_lag_sign_census(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        ("en", -1, 1), ("en", 1, 1)]


def test_kendall_width_price(ray_session, tmp_path):
    from ctdray.pipelines.analytics import kendall_width_price
    # cells: (w=1,p=0), (w=2,p=1), (w=2,p=0) -> conc 1, disc 0,
    # ties_w 1 (the two w=2), ties_p 1 (the two p=0)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 2, 3, 3], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_totalprice": pa.array([100.0, 55000.0, 200.0]),
    }), str(tmp_path / "orders.parquet"))
    out = kendall_width_price(str(tmp_path)).to_pandas()
    assert out.n_orders[0] == 3
    assert out.conc[0] == "1" and out.disc[0] == "0"
    assert out.ties_w[0] == "1" and out.ties_p[0] == "1"
    assert out.ties_both[0] == "0"


def test_order_price_ratio_pairs_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import order_price_ratio_pairs_hist
    # order 1 cents [100, 250, 600]: all 3 pairs double; order 2
    # [100, 150]: none
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "l_extendedprice": pa.array([1.0, 2.5, 6.0, 1.0, 1.5]),
    }), str(tmp_path / "lineitem.parquet"))
    out = order_price_ratio_pairs_hist(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [(0, 1), (3, 1)]

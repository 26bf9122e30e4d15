"""Batch 152: vocab overlap coefficient, bigram PMI, histogram
intersection kernel, Collatz stopping census."""
import pyarrow as pa
import pyarrow.parquet as pq


def test_lang_vocab_overlap_coeff(ray_session, tmp_path):
    from ctdray.pipelines.analytics import lang_vocab_overlap_coeff
    pq.write_table(pa.table({
        "lang": pa.array(["en", "de", "en"]),
        "text": pa.array(["a b c", "b c", "d"]),
    }), str(tmp_path / "documents.parquet"))
    out = lang_vocab_overlap_coeff(str(tmp_path)).to_pandas()
    # en vocab {a,b,c,d} (4), de vocab {b,c} (2), inter {b,c} (2)
    # overlap = 2/min(4,2) = 1.0 -> 1_000_000 ppm
    assert list(map(tuple, out.values)) == [
        ("de", "en", 2, 4, 2, 1_000_000)]


def test_token_bigram_pmi_top10(ray_session, tmp_path):
    from ctdray.pipelines.analytics import token_bigram_pmi_top10
    # bigrams: (a,b)x2  (b,a)x1  (x,y)x2 ; support floor drops (b,a)
    pq.write_table(pa.table({
        "text": pa.array(["a b a b", "x y", "x y"]),
    }), str(tmp_path / "documents.parquet"))
    out = token_bigram_pmi_top10(str(tmp_path)).to_pandas()
    # N=5; (a,b): c=2, ca=2 (left 'a'), cb=2 (right 'b')
    #   -> 2*5*1e6 // 4 = 2_500_000
    # (x,y): c=2, ca=2, cb=2 -> 2_500_000 ; tie broken by ta asc
    assert list(map(tuple, out.values)) == [
        ("a", "b", 2, 2, 2, 2_500_000),
        ("x", "y", 2, 2, 2, 2_500_000)]


def test_region_priority_hist_intersection(ray_session, tmp_path):
    from ctdray.pipelines.analytics import \
        region_priority_hist_intersection
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int64()),
        "r_name": pa.array(["EAST", "WEST"]),
    }), str(tmp_path / "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_regionkey": pa.array([0, 1], pa.int64()),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_nationkey": pa.array([0, 1], pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT",
                                     "2-HIGH", "1-URGENT",
                                     "3-MEDIUM"]),
    }), str(tmp_path / "orders.parquet"))
    out = region_priority_hist_intersection(str(tmp_path)).to_pandas()
    # EAST hist {U:2, H:1} n=3; WEST hist {U:1, M:1} n=2
    # kernel = min(2*2, 1*3) + min(1*2, 0) + min(0, 1*3) = 3
    # ppm = 3 * 1e6 // 6 = 500_000
    assert list(map(tuple, out.values)) == [
        ("EAST", "WEST", 3, 2, 500_000)]


def test_collatz_stopping_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import collatz_stopping_census
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    out = collatz_stopping_census(str(tmp_path)).to_pandas()
    # stopping times: 1->0, 2->1, 3->7, 4->2, 5->5, 6->8
    assert list(map(tuple, out.values)) == [
        (0, 1, 1), (1, 1, 2), (2, 1, 4),
        (5, 1, 5), (7, 1, 3), (8, 1, 6)]

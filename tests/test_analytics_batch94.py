"""Batch 94: stopword share by source, duplicated shingles top-k,
brand-size price monotonicity audit, region × part-type lift."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_stopword_share_by_source(ray_session, tmp_path):
    from ctdray.pipelines.analytics import stopword_share_by_source
    # source A: "the cat" -> 1/2 stop; source B: "dog" -> 0/1
    pq.write_table(pa.table({
        "doc_id": pa.array(["d1", "d2"]),
        "source": pa.array(["A", "B"]),
        "text": pa.array(["the cat", "dog"]),
    }), str(tmp_path / "documents.parquet"))
    out = stopword_share_by_source(str(tmp_path)).to_pandas() \
        .set_index("source")
    assert out.loc["A"].n_tokens == 2
    assert out.loc["A"].n_stopwords == 1
    assert out.loc["A"].stopword_ppm == 500_000
    assert out.loc["B"].stopword_ppm == 0


def test_dup_shingles_topk(ray_session, tmp_path):
    from ctdray.pipelines.analytics import dup_shingles_topk
    # 3-shingles: "a b c" appears in d1 (twice -> df 1) and d2 (df 2);
    # "b c a" only in d1
    pq.write_table(pa.table({
        "doc_id": pa.array(["d1", "d2"]),
        "text": pa.array(["a b c a b c", "x a b c"]),
    }), str(tmp_path / "documents.parquet"))
    out = dup_shingles_topk(str(tmp_path), n=3).to_pandas()
    assert len(out) == 1
    assert out.shingle[0] == "a b c"
    assert out.df[0] == 2


def test_brand_size_price_inversions(ray_session, tmp_path):
    from ctdray.pipelines.analytics import brand_size_price_inversions
    # brand B1: size 1 -> 100c, size 2 -> 50c (inversion),
    #           size 3 -> 200c (ok): 2 pairs, 1 inversion
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
        "p_brand": pa.array(["B1", "B1", "B1", "B2"]),
        "p_size": pa.array([1, 2, 3, 1], pa.int32()),
        "p_retailprice": pa.array([1.0, 0.5, 2.0, 1.0]),
    }), str(tmp_path / "part.parquet"))
    out = brand_size_price_inversions(str(tmp_path)).to_pandas() \
        .set_index("brand")
    assert out.loc["B1"].n_pairs == 2
    assert out.loc["B1"].n_inversions == 1
    assert "B2" not in out.index  # single size -> no pairs


def test_region_parttype_lift(ray_session, tmp_path):
    from ctdray.pipelines.analytics import region_parttype_lift
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0], pa.int32()),
        "r_name": pa.array(["EAST"]),
    }), str(tmp_path / "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0], pa.int32()),
        "n_regionkey": pa.array([0], pa.int32()),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1], pa.int64()),
        "c_nationkey": pa.array([0], pa.int32()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10], pa.int64()),
        "o_custkey": pa.array([1], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_type": pa.array(["STEEL", "BRASS"]),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10], pa.int64()),
        "l_partkey": pa.array([1, 2], pa.int64()),
        "l_extendedprice": pa.array([1.0, 3.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = region_parttype_lift(str(tmp_path)).to_pandas()
    rows = {(r.cust_region, r.p_type): (r.revenue_cents, r.lift_ppm)
            for r in out.itertuples()}
    # single region: lift = 1e6 * cell * total // (total * cell_type)
    assert rows[("EAST", "STEEL")] == (100, 1_000_000)
    assert rows[("EAST", "BRASS")] == (300, 1_000_000)

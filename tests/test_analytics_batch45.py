"""Batch 45: integer PageRank on the nation trade graph, brand-name
LCP via order statistics, per-vector top-2 dims, EXCEPT ALL."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_pagerank_nation_trade(ray_session, tmp_path):
    from ctdray.pipelines.analytics import pagerank_nation_trade
    # two nations; all trade flows 0 -> 1
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_name": pa.array(["A", "B"])}),
        str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([10], pa.int64()),
        "s_nationkey": pa.array([1], pa.int32())}),
        str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([100], pa.int64()),
        "c_nationkey": pa.array([0], pa.int32())}),
        str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1], pa.int64()),
        "o_custkey": pa.array([100], pa.int64())}),
        str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1], pa.int64()),
        "l_suppkey": pa.array([10, 10], pa.int64())}),
        str(tmp_path / "lineitem.parquet"))
    out = pagerank_nation_trade(str(tmp_path)).to_pandas() \
        .set_index("nationkey").sort_index()
    # node 0 has no inbound: pr = 150000 every iteration.
    assert out.loc[0].pr_e6 == 150_000
    # node 1 iter1: 150000 + 850*1000000//1000 = 1000000;
    # iter2/3: 150000 + 850*150000//1000 = 277500.
    assert out.loc[1].pr_e6 == 277_500
    # broadcast_key_limit=0 forces the shuffle_lookup_join attach path
    # (customer/supplier never broadcast) — identical ranks
    out_shuf = pagerank_nation_trade(str(tmp_path), broadcast_key_limit=0) \
        .to_pandas().set_index("nationkey").sort_index()
    assert out_shuf.loc[0].pr_e6 == 150_000
    assert out_shuf.loc[1].pr_e6 == 277_500


def test_brand_name_lcp(ray_session, tmp_path):
    from ctdray.pipelines.analytics import brand_name_lcp
    pq.write_table(pa.table({
        "p_partkey": pa.array(range(4), pa.int64()),
        "p_name": pa.array(["blue bolt", "blue bit", "blunt", "nut"]),
        "p_brand": pa.array(["B1", "B1", "B1", "B2"])}),
        str(tmp_path / "part.parquet"))
    out = brand_name_lcp(str(tmp_path)).to_pandas().set_index("p_brand")
    # min="blue bit", max="blunt" -> common prefix "blu"
    assert out.loc["B1"].lcp_len == 3
    assert out.loc["B1"].n_parts == 3
    assert out.loc["B2"].lcp_len == 3  # single name: LCP with itself


def test_embedding_top2_dims(ray_session, tmp_path):
    from ctdray.pipelines.analytics import embedding_top2_dims
    vecs = np.zeros((2, 64), dtype=np.float32)
    vecs[0, 5] = 0.9
    vecs[0, 2] = 0.5
    vecs[1, 3] = 0.7   # tie between dim 3 and 7 -> smaller dim first
    vecs[1, 7] = 0.7
    pq.write_table(pa.table({
        "vec_id": pa.array(range(2), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array([0, 0], pa.int32())}),
        str(tmp_path / "embeddings.parquet"))
    out = embedding_top2_dims(str(tmp_path)).to_pandas() \
        .set_index(["dim1", "dim2"])
    assert out.loc[(5, 2)].n_vecs == 1
    assert out.loc[(3, 7)].n_vecs == 1


def test_views_except_all_purchases(ray_session, tmp_path):
    from ctdray.pipelines.analytics import views_except_all_purchases
    pq.write_table(pa.table({
        "event_id": pa.array(range(6), pa.int64()),
        "ts": pa.array([np.datetime64("2024-01-01", "us").item()] * 6,
                       pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        # u1: 2 views 1 purchase -> surplus 1; u2: 1v 1p -> drop;
        # u3: 1 purchase only -> drop
        "event_type": pa.array(["view", "view", "purchase",
                                "view", "purchase", "purchase"]),
        "value": pa.array([0.0] * 6),
    }), str(tmp_path / "events.parquet"))
    out = views_except_all_purchases(str(tmp_path)).to_pandas()
    assert list(out.user_id) == [1]
    assert list(out.surplus_views) == [1]

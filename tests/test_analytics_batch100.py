"""Batch 100: exact nearest-centroid confusion, brand-loyalty deciles,
suffix diversity, sign-bucket label purity."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_nearest_centroid_confusion(ray_session, tmp_path):
    from ctdray.pipelines.analytics import nearest_centroid_confusion
    rng = np.random.default_rng(7)
    # two tight clusters around +e0 and -e0; one label-1 vector planted
    # inside cluster 0 must be predicted as label 0
    a = rng.normal(0.8, 0.01, (5, 64)).astype(np.float32)
    b = rng.normal(-0.8, 0.01, (5, 64)).astype(np.float32)
    planted = rng.normal(0.8, 0.01, (1, 64)).astype(np.float32)
    vecs = np.concatenate([a, b, planted])
    labels = np.array([0] * 5 + [1] * 5 + [1], np.int32)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(11), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))
    out = nearest_centroid_confusion(str(tmp_path)).to_pandas()
    cells = {(r.true_label, r.pred_label): r.n_vectors
             for r in out.itertuples()}
    assert cells[(0, 0)] == 5
    assert cells[(1, 1)] == 5
    assert cells[(1, 0)] == 1


def test_customer_brand_loyalty_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import customer_brand_loyalty_hist
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_brand": pa.array(["A", "A", "B"]),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11], pa.int64()),
        "o_custkey": pa.array([100, 200], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    # cust 100: 3 brand-A lines + 1 brand-B -> 750000 ppm -> decile 7
    # cust 200: 1 brand-B line -> decile 10
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10, 10, 10, 11], pa.int64()),
        "l_partkey": pa.array([1, 2, 1, 3, 3], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = customer_brand_loyalty_hist(str(tmp_path)).to_pandas() \
        .set_index("loyalty_decile")
    assert out.loc[7].n_customers == 1
    assert out.loc[10].n_customers == 1


def test_token_suffix_diversity(ray_session, tmp_path):
    from ctdray.pipelines.analytics import token_suffix_diversity
    pq.write_table(pa.table({
        "text": pa.array(["walking talking walking x y",
                          "talking jumped"]),
    }), str(tmp_path / "documents.parquet"))
    out = token_suffix_diversity(str(tmp_path)).to_pandas()
    top = out.iloc[0]
    assert top.suffix == "ing"
    assert top.n_types == 2          # walking, talking
    assert top.n_occurrences == 4
    # 1-char tokens dropped entirely
    assert "x" not in set(out.suffix)


def test_signbucket_label_purity(ray_session, tmp_path):
    from ctdray.pipelines.analytics import signbucket_label_purity
    # vec0/vec1 -> bucket 1 (only dim0 positive), labels 0,0
    # vec2 -> bucket 1, label 1 -> bucket 1: n=3, max=2, labels=2
    base = -np.ones(64, np.float32)
    v = np.stack([base.copy() for _ in range(3)])
    v[:, 0] = 1.0
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(3), pa.int64()),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
        "label": pa.array([0, 0, 1], pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))
    out = signbucket_label_purity(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.bucket, r.n_vectors, r.max_label_n, r.n_labels) \
        == (1, 3, 2, 2)

"""Batch 35: per-doc mode token, label peak dim, term first position,
discount-tax joint histogram."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_doc_top_token_tie(ray_session, tmp_path):
    from ctdray.pipelines.analytics import doc_top_token
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        # doc 0: b x2, a x2 -> tie, lexicographic a; doc 1: z x2
        "text": pa.array(["b a b a", "z q z"]),
    }), str(tmp_path / "documents.parquet"))
    out = doc_top_token(str(tmp_path)).to_pandas() \
        .set_index("doc_id").sort_index()
    assert list(out.top_token) == ["a", "z"]
    assert list(out.n_occurrences) == [2, 2]


def test_label_peak(ray_session, tmp_path):
    from ctdray.pipelines.analytics import label_peak_dim
    pq.write_table(pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        # label 0 centroid sum: [3.0, -4.0] -> peak dim 1 (|−4|)
        # label 1: [0.5, 0.2] -> peak dim 0
        "embedding": pa.array([[1.0, -2.0], [2.0, -2.0], [0.5, 0.2]],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 0, 1], pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))
    out = label_peak_dim(str(tmp_path)).to_pandas() \
        .set_index("label").sort_index()
    assert list(out.peak_dim) == [1, 0]
    assert list(out.component_e4) == [-40_000, 5_000]


def test_term_first_pos(ray_session, tmp_path):
    from ctdray.pipelines.analytics import docs_term_first_pos
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a key b key", "no match here", "key x"]),
    }), str(tmp_path / "documents.parquet"))
    out = docs_term_first_pos(str(tmp_path)).to_pandas() \
        .set_index("doc_id").sort_index()
    assert dict(out.first_pos) == {0: 2, 2: 1}


def test_joint_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import discount_tax_joint_hist
    pq.write_table(pa.table({
        "l_discount": pa.array([0.05, 0.05, 0.10]),
        "l_tax": pa.array([0.02, 0.02, 0.03]),
        "l_extendedprice": pa.array([1.00, 2.00, 5.00]),
    }), str(tmp_path / "lineitem.parquet"))
    out = discount_tax_joint_hist(str(tmp_path)).to_pandas()
    got = {(d, t): (n, r) for d, t, n, r in
           zip(out.disc_pct, out.tax_pct, out.n_lines,
               out.revenue_cents)}
    assert got == {(5, 2): (2, 300), (10, 3): (1, 500)}

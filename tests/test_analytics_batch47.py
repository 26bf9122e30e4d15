"""Batch 47: longest token per doc, context diversity, balance band
self-join, exclusive vocabulary."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_doc_longest_token(ray_session, tmp_path):
    from ctdray.pipelines.analytics import doc_longest_token
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        # doc0: tie between "bbbb" and "aaaa" -> lexicographically first
        "text": pa.array(["bbbb x aaaa", "one tremendous tok"]),
    }), str(tmp_path / "documents.parquet"))
    out = doc_longest_token(str(tmp_path)).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[0].longest_token == "aaaa"
    assert out.loc[0].token_len == 4
    assert out.loc[1].longest_token == "tremendous"


def test_top_token_context_diversity(ray_session, tmp_path):
    from ctdray.pipelines.analytics import top_token_context_diversity
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        # "the" appears 4x followed by {cat, dog, cat} -> 2 contexts
        "text": pa.array(["the cat the dog", "the cat the"]),
    }), str(tmp_path / "documents.parquet"))
    out = top_token_context_diversity(str(tmp_path), n_top=1).to_pandas()
    assert list(out.tok) == ["the"]
    assert list(out.n_contexts) == [2]


def test_customer_balance_peers(ray_session, tmp_path):
    from ctdray.pipelines.analytics import customer_balance_peers
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_nationkey": pa.array([0, 0, 0, 1], pa.int32()),
        # nation 0: 100.00, 150.00, 300.00 -> 1&2 are peers (±100)
        "c_acctbal": pa.array([100.0, 150.0, 300.0, 100.0]),
    }), str(tmp_path / "customer.parquet"))
    out = customer_balance_peers(str(tmp_path)).to_pandas() \
        .set_index("c_custkey").sort_index()
    assert list(out.n_peers) == [1, 1, 0, 0]


def test_source_exclusive_vocab(ray_session, tmp_path):
    from ctdray.pipelines.analytics import source_exclusive_vocab
    pq.write_table(pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        # shared: "x"; s1-only: "aa" "bb"; s2-only: "cc"
        "text": pa.array(["x aa", "bb aa", "x cc"]),
        "source": pa.array(["s1", "s1", "s2"]),
    }), str(tmp_path / "documents.parquet"))
    out = source_exclusive_vocab(str(tmp_path)).to_pandas() \
        .set_index("source").sort_index()
    assert out.loc["s1"].n_exclusive == 2
    assert out.loc["s2"].n_exclusive == 1

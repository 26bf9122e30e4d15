"""Batch 25: grouped top-k tokens, dimension-anti-fact join, round-value
bias, token-length histogram."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_top_tokens_per_lang_ties(ray_session, tmp_path):
    from ctdray.pipelines.analytics import top_tokens_per_lang
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["b b a c", "z z y"]),
        "lang": pa.array(["en", "fr"]),
    }), str(tmp_path / "documents.parquet"))
    out = top_tokens_per_lang(str(tmp_path), k=2).to_pandas() \
        .sort_values(["lang", "rnk"])
    assert list(out.tok) == ["b", "a", "z", "y"]
    assert list(out.rnk) == [1, 2, 1, 2]
    assert list(out.n) == [2, 1, 2, 1]


def test_parts_never_ordered(ray_session, tmp_path):
    from ctdray.pipelines.analytics import parts_never_ordered
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_brand": pa.array(["B1", "B2", "B3"]),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 3], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = parts_never_ordered(str(tmp_path)).to_pandas()
    assert list(out.p_partkey) == [2]


def test_round_value_bias(ray_session, tmp_path):
    from ctdray.pipelines.analytics import event_round_value_bias
    pq.write_table(pa.table({
        "event_id": pa.array(range(4), pa.int64()),
        "ts": pa.array([_ts("2024-01-01")] * 4, pa.timestamp("us")),
        "user_id": pa.array([0] * 4, pa.int64()),
        "event_type": pa.array(["x"] * 4),
        # cents: 100 (whole $), 1000 (whole $10), 150, 123
        "value": pa.array([1.00, 10.00, 1.50, 1.23]),
    }), str(tmp_path / "events.parquet"))
    out = event_round_value_bias(str(tmp_path)).to_pandas()
    assert (out.n_whole_dollar[0], out.n_whole_ten[0],
            out.n_total[0]) == (2, 1, 4)


def test_token_length_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import token_length_hist
    pq.write_table(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["a bb ccc bb"]),
    }), str(tmp_path / "documents.parquet"))
    out = token_length_hist(str(tmp_path)).to_pandas()
    got = dict(zip(out.tok_len, out.n))
    assert got == {1: 1, 2: 2, 3: 1}

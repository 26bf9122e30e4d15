"""End-to-end Ray Data pipeline: span equality vs the oracle, nested output,
blocks table, and checkpoint/resume idempotency (SURVEY.md §5)."""
import os

import numpy as np
import pyarrow.compute as pc
import pytest

from ctdray.config import PipelineConfig
from ctdray.fixtures import make_corpus, write_corpus
from ctdray.oracle import flatten_out_docs, run_oracle

KEY = ["doc_id", "seq", "kind", "text", "media_ref", "offset", "order"]


@pytest.fixture(scope="module")
def corpus_tbl():
    return make_corpus(16)


def _norm(df):
    return df[KEY].sort_values(KEY).reset_index(drop=True)


def test_flat_spans_match_oracle(ray_session, corpus_tbl):
    import ray.data as rd

    from ctdray.pipelines.extract import build_flat_spans

    got = _norm(build_flat_spans(rd.from_arrow(corpus_tbl)).to_pandas())
    exp = _norm(flatten_out_docs(run_oracle(corpus_tbl)).to_pandas())
    assert len(got) == len(exp) > 0
    assert got.equals(exp)


def test_out_docs_nested(ray_session, corpus_tbl):
    import ray.data as rd

    from ctdray.pipelines.extract import build_out_docs

    out = build_out_docs(rd.from_arrow(corpus_tbl)).to_pandas()
    assert len(out) == corpus_tbl.num_rows
    row = out[out.doc_id == "doc-00000000"].iloc[0]
    kinds = [s["kind"] for s in row["spans"]]
    assert set(kinds) <= {"text", "media", "text_line"}
    # every text_line directly follows its media span group
    for i, s in enumerate(row["spans"]):
        if s["kind"] == "text_line":
            prev = row["spans"][i - 1]
            assert prev["kind"] in ("media", "text_line")
            assert prev["offset"] == s["offset"]


def test_blocks_table(ray_session, corpus_tbl):
    import ray.data as rd

    from ctdray.pipelines.extract import build_blocks

    blocks = build_blocks(rd.from_arrow(corpus_tbl)).to_pandas()
    assert len(blocks) > 0
    assert {"doc_id", "media_offset", "media_ref", "block"} <= set(blocks.columns)
    one = blocks.iloc[0]["block"]
    assert set(one) >= {"xyxy", "lines", "language", "vertical", "font_size",
                        "angle", "order"}
    # per-page block order is 0..n-1
    for ref, grp in blocks.groupby("media_ref"):
        orders = sorted(b["order"] for b in grp["block"])
        assert orders == list(range(len(orders)))


def test_checkpoint_resume_idempotent(ray_session, tmp_path):
    from ctdray.state.manifest import read_manifest, read_result, run_checkpointed

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    write_corpus(in_dir, 9, rows_per_file=3)       # 3 fragments
    cfg = PipelineConfig()

    # Submit 1 "killed" after one chunk.
    s1 = run_checkpointed(in_dir, out_dir, cfg, chunk_size=1, max_chunks=1)
    assert s1["chunks_done"] == 1 and s1["chunks_skipped"] == 0
    man0 = os.path.join(out_dir, "manifest", "chunk-00000.json")
    mtime0 = os.path.getmtime(man0)

    # Submit 2 resumes: skips chunk 0, completes the rest.
    s2 = run_checkpointed(in_dir, out_dir, cfg, chunk_size=1)
    assert s2["chunks_skipped"] == 1 and s2["chunks_done"] == 2
    assert os.path.getmtime(man0) == mtime0        # finished work untouched

    # Submit 3 is a no-op.
    s3 = run_checkpointed(in_dir, out_dir, cfg, chunk_size=1)
    assert s3["chunks_done"] == 0 and s3["chunks_skipped"] == 3

    # Final result equals the oracle on the same corpus.
    recs = read_manifest(out_dir)
    assert len(recs) == 3
    assert all(r["n_detected_spans"] >= 0 and "lineage" in r for r in recs)
    got = read_result(out_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = run_oracle(make_corpus(9)).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert list(got.doc_id) == list(exp.doc_id)
    for g, e in zip(got.spans, exp.spans):
        assert [tuple(sorted(s.items())) for s in g] == \
               [tuple(sorted(s.items())) for s in e]


def test_checkpoint_interleaved_resume(ray_session, tmp_path):
    """Headline-pipeline checkpointing (doc_id-range chunks over the bench
    corpus shape): interrupted submit resumes with zero rework and the
    concatenated chunk outputs equal the direct pipeline.  The full-scale
    SIGKILL variant runs via tools/resume_bench.py at sf0.1 (BASELINE.md)."""
    import pyarrow.compute as pc

    from ctdray.pipelines.extract import interleaved_extraction
    from ctdray.state.manifest import (read_manifest, read_result,
                                       run_checkpointed_interleaved)

    sf_dir = "/root/testdata/sf0.001"
    out_dir = str(tmp_path / "ckpt")

    # Submit 1 "killed" after two of four chunks.
    s1 = run_checkpointed_interleaved(sf_dir, out_dir, num_chunks=4,
                                      max_chunks=2)
    assert s1["chunks_done"] == 2 and s1["chunks_skipped"] == 0
    man0 = os.path.join(out_dir, "manifest", "chunk-00000.json")
    mtime0 = os.path.getmtime(man0)

    # Submit 2 resumes: skips the published ranges, completes the rest.
    s2 = run_checkpointed_interleaved(sf_dir, out_dir, num_chunks=4)
    assert s2["chunks_skipped"] == 2 and s2["chunks_done"] == 2
    assert os.path.getmtime(man0) == mtime0        # no rework

    recs = read_manifest(out_dir)
    assert len(recs) == 4
    assert all(r["n_pages"] > 0 and "detected_per_page_hist" in r
               for r in recs)
    # Ranges partition the corpus: 500 docs, no gaps/overlap.
    spans = sorted(tuple(r["doc_id_range"]) for r in recs)
    assert spans[0][0] == 0 and spans[-1][1] == 500
    assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))

    KEY2 = ["doc_id", "seq", "kind", "text", "media_ref", "offset", "order"]
    got = read_result(out_dir).to_pandas()[KEY2].sort_values(KEY2) \
        .reset_index(drop=True)
    exp = interleaved_extraction(sf_dir).to_pandas()[KEY2].sort_values(KEY2) \
        .reset_index(drop=True)
    assert len(got) == len(exp) > 0
    assert got.equals(exp)

    # A re-submit with a DIFFERENT chunking plan must refuse, not silently
    # overlay new ranges on the stale chunk dirs (manifest._check_plan).
    with pytest.raises(ValueError, match="chunking plan"):
        run_checkpointed_interleaved(sf_dir, out_dir, num_chunks=8)


def test_error_rows_never_crash(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ctdray.pipelines.extract import build_flat_spans
    from ctdray.schema import DOC_SCHEMA

    bad = pa.Table.from_pylist([{
        "doc_id": "doc-x", "spans": [
            {"kind": "media", "text": "", "media_ref": "bogus://", "offset": 0},
            {"kind": "text", "text": "t", "media_ref": "", "offset": 1},
        ]}], schema=DOC_SCHEMA)
    out = build_flat_spans(rd.from_arrow(bad)).to_pandas()
    assert list(out["kind"]) == ["media", "text"]


def test_hybrid_dense_routing_matches_oracle(ray_session, corpus_tbl):
    """Force the dense tail: threshold 2 routes many docs through the
    explode → groupby(doc_id) splice path; spans must still match the oracle
    exactly (both paths active at once)."""
    import ray.data as rd

    from ctdray.pipelines.extract import build_flat_spans

    cfg = PipelineConfig(dense_media_threshold=2, detect_concurrency=2,
                         detect_compute="actors")
    got = _norm(build_flat_spans(rd.from_arrow(corpus_tbl), cfg).to_pandas())
    exp = _norm(flatten_out_docs(run_oracle(corpus_tbl)).to_pandas())
    assert len(got) == len(exp) > 0
    assert got.equals(exp)


def test_determinism_across_batching_and_compute(ray_session, corpus_tbl):
    """Same corpus, different batch sizes / block counts / compute modes →
    identical span tables (SURVEY.md §5 property: pipeline output is
    invariant to parallelism choices)."""
    import ray.data as rd

    from ctdray.pipelines.extract import build_flat_spans

    configs = [
        PipelineConfig(docs_batch_size=1),
        PipelineConfig(docs_batch_size=16, detect_batch_size=2),
        PipelineConfig(detect_compute="actors", detect_concurrency=2,
                       docs_batch_size=3),
    ]
    outs = []
    for cfg in configs:
        ds = rd.from_arrow(corpus_tbl).repartition(5)
        outs.append(_norm(build_flat_spans(ds, cfg).to_pandas()))
    assert len(outs[0]) > 0
    assert outs[0].equals(outs[1])
    assert outs[0].equals(outs[2])


def test_write_docs_round_trip(ray_session, tmp_path):
    """Nested span arrays survive the Parquet sink/source round trip
    (the Lance-adapter contract, ctdray.sources.docs)."""
    import ray.data as rd

    from ctdray.oracle import run_oracle
    from ctdray.sources.docs import read_docs, write_docs

    out_docs = run_oracle(make_corpus(5))
    path = str(tmp_path / "outdocs")
    write_docs(rd.from_arrow(out_docs), path)
    back = read_docs(path).to_pandas().sort_values("doc_id").reset_index(drop=True)
    orig = out_docs.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(back.doc_id) == list(orig.doc_id)
    for g, e in zip(back.spans, orig.spans):
        assert [tuple(sorted(s.items())) for s in g] == \
               [tuple(sorted(s.items())) for s in e]


def test_doc_keys_scan_matches_reader_counts(ray_session):
    """The key-only routing scan (no text, no span synthesis) must agree
    exactly with the n_media column the full interleave reader computes."""
    from ctdray.pipelines.interleave import (read_interleaved_doc_keys,
                                             read_interleaved_docs)

    sf = "/root/testdata/sf0.001"
    keys = {r["doc_id"]: r["n_media"]
            for r in read_interleaved_doc_keys(sf).take_all()}
    full = {r["doc_id"]: r["n_media"]
            for r in read_interleaved_docs(sf).select_columns(
                ["doc_id", "n_media"]).take_all()}
    assert keys == full and len(keys) > 0


def test_single_scan_routing_no_dense_tail(ray_session):
    """With no dense docs the builder must take the unfiltered fused path
    (no union, no materialize) and still match the oracle."""
    import pandas as pd
    import ray.data as rd

    from ctdray.fixtures import make_corpus
    from ctdray.oracle import flatten_out_docs, run_oracle
    from ctdray.pipelines.extract import build_flat_spans

    tbl = make_corpus(6)
    got = build_flat_spans(rd.from_arrow(tbl)).to_pandas() \
        .sort_values(["doc_id", "seq"]).reset_index(drop=True)
    exp = flatten_out_docs(run_oracle(tbl)).to_pandas() \
        .sort_values(["doc_id", "seq"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_checkpointed_split_layout_resumable(ray_session, tmp_path):
    """The checkpointed headline runner works unchanged under the SPLIT
    (prod GPU) detect layout — chunk publish + resume skip + output
    row-identity with the fused checkpointed run.  The lineage hash covers
    cfg (detect_layout included), so fused and split manifests can never
    be mistaken for each other."""
    import os

    from ctdray.config import PipelineConfig
    from ctdray.state.manifest import (read_manifest, read_result,
                                      run_checkpointed_interleaved)

    sf_dir = "/root/testdata/sf0.001"
    split_cfg = PipelineConfig(detect_layout="split")

    out_split = str(tmp_path / "ckpt_split")
    s1 = run_checkpointed_interleaved(sf_dir, out_split, cfg=split_cfg,
                                      num_chunks=4, max_chunks=2)
    assert s1["chunks_done"] == 2
    s2 = run_checkpointed_interleaved(sf_dir, out_split, cfg=split_cfg,
                                      num_chunks=4)
    assert s2["chunks_skipped"] == 2 and s2["chunks_done"] == 2
    assert len(read_manifest(out_split)) == 4

    out_fused = str(tmp_path / "ckpt_fused")
    run_checkpointed_interleaved(sf_dir, out_fused, num_chunks=4)

    KEY2 = ["doc_id", "seq", "kind", "text", "media_ref", "offset", "order"]
    got = read_result(out_split).to_pandas()[KEY2].sort_values(KEY2) \
        .reset_index(drop=True)
    exp = read_result(out_fused).to_pandas()[KEY2].sort_values(KEY2) \
        .reset_index(drop=True)
    assert len(got) == len(exp) > 0
    assert got.equals(exp)


def test_checkpoint_interleaved_concurrent_chunks(ray_session, tmp_path):
    """The thread-pooled chunk execution path (round-5 runner): 8 chunks
    through 6 concurrent workers publish exactly the direct pipeline's
    rows, with a complete manifest."""
    from ctdray.pipelines.extract import interleaved_extraction
    from ctdray.state.manifest import (read_manifest, read_result,
                                       run_checkpointed_interleaved)

    sf_dir = "/root/testdata/sf0.001"
    out_dir = str(tmp_path / "ckpt_conc")
    s = run_checkpointed_interleaved(sf_dir, out_dir, num_chunks=8,
                                     concurrency=6)
    assert s["chunks_done"] == 8 and s["chunks_skipped"] == 0
    assert len(read_manifest(out_dir)) == 8

    KEY = ["doc_id", "seq", "kind", "text", "media_ref", "offset", "order"]
    got = read_result(out_dir).to_pandas()[KEY].sort_values(KEY) \
        .reset_index(drop=True)
    exp = interleaved_extraction(sf_dir).to_pandas()[KEY].sort_values(KEY) \
        .reset_index(drop=True)
    assert len(got) == len(exp) > 0
    assert got.equals(exp)

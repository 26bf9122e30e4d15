"""Extreme-scale routing fallback (SURVEY.md §4 skew row): when the dense-doc
id set exceeds the broadcast cap, ``_dense_doc_ids`` returns ``None`` and the
hybrid pipelines fall back to TWO complementary-predicate full scans instead
of broadcast id-set membership.  Output must be identical either way — the
routing only decides WHICH task processes a document, never what it emits."""
import pyarrow as pa
import pytest

from ctdray.config import PipelineConfig
from ctdray.fixtures import make_corpus

SPAN_KEY = ["doc_id", "offset", "kind", "text", "media_ref", "order"]


@pytest.fixture(scope="module")
def corpus_tbl():
    return make_corpus(14)


def _spans_df(ds):
    df = ds.to_pandas()
    return df[SPAN_KEY].sort_values(SPAN_KEY).reset_index(drop=True)


def _dense_cfg(**kw):
    # threshold 1 → a real dense tail exists in the fixture corpus, so both
    # routing branches carry documents
    return PipelineConfig(dense_media_threshold=1, **kw)


def test_dense_doc_ids_cap_returns_none(ray_session, corpus_tbl):
    import ray.data as rd

    from ctdray.pipelines.extract import _dense_doc_ids

    docs = rd.from_arrow(corpus_tbl)
    ids = _dense_doc_ids(docs, 1, None)
    assert ids                     # the fixture corpus HAS a dense tail
    assert _dense_doc_ids(docs, 1, None, limit=0) is None   # cap exceeded


def test_predicate_fallback_flat_spans_equal(ray_session, corpus_tbl,
                                             monkeypatch):
    """Force the id-cap fallback on the FUSED hybrid: flat spans equal the
    broadcast-routing result row for row."""
    import ray.data as rd

    from ctdray.pipelines import extract

    cfg = _dense_cfg()
    base = _spans_df(extract.build_flat_spans(rd.from_arrow(corpus_tbl), cfg))
    assert len(base) > 0
    monkeypatch.setattr(extract, "_dense_doc_ids",
                        lambda docs, thr, keys, limit=1_000_000: None)
    fb = _spans_df(extract.build_flat_spans(rd.from_arrow(corpus_tbl), cfg))
    assert fb.equals(base)


def test_predicate_fallback_split_layout_equal(ray_session, corpus_tbl,
                                               monkeypatch):
    """Same forcing on the SPLIT layout's hybrid (_split_out_docs)."""
    import ray.data as rd

    from ctdray.pipelines import extract

    cfg = _dense_cfg(detect_layout="split")
    base = _spans_df(extract.build_flat_spans(rd.from_arrow(corpus_tbl), cfg))
    monkeypatch.setattr(extract, "_dense_doc_ids",
                        lambda docs, thr, keys, limit=1_000_000: None)
    fb = _spans_df(extract.build_flat_spans(rd.from_arrow(corpus_tbl), cfg))
    assert fb.equals(base)


def test_predicate_fallback_detected_spans_equal(ray_session, corpus_tbl,
                                                 monkeypatch):
    """And on build_detected_spans (page-row hybrid)."""
    import ray.data as rd

    from ctdray.pipelines import extract

    cfg = _dense_cfg()
    key = ["doc_id", "offset", "kind", "text", "media_ref", "order"]
    base = extract.build_detected_spans(
        rd.from_arrow(corpus_tbl), cfg).to_pandas()
    base = base[key].sort_values(key).reset_index(drop=True)
    monkeypatch.setattr(extract, "_dense_doc_ids",
                        lambda docs, thr, keys, limit=1_000_000: None)
    fb = extract.build_detected_spans(
        rd.from_arrow(corpus_tbl), cfg).to_pandas()
    fb = fb[key].sort_values(key).reset_index(drop=True)
    assert fb.equals(base)

"""User span-stage hook (SURVEY.md §2.10): `span_stages=[...]` applies
user `map_batches` UDFs to the detected span rows between detection and
splice — the engine's explicit version of the reference's implicit
extension points (e.g. an OCR stage rewriting text via the O12 hook)."""
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from ctdray.fixtures import make_corpus

SPAN_KEY = ["doc_id", "offset", "kind", "text", "media_ref", "order"]


def _upper_stage():
    # a factory returning a CLOSURE: module-level test functions pickle by
    # reference (the test module is not importable in Ray workers)
    def stage(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("text")
        return batch.set_column(i, "text",
                                pc.utf8_upper(batch.column("text")))
    return stage


def _first_line_only():
    def stage(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("order"), 0))
    return stage


def _spans_df(ds):
    df = ds.to_pandas()
    return df[SPAN_KEY].sort_values(SPAN_KEY).reset_index(drop=True)


def test_identity_stage_changes_nothing(ray_session):
    import ray.data as rd

    from ctdray.pipelines.extract import build_out_docs

    corpus = make_corpus(10)

    def norm(ds):
        df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
        return [(d, [tuple(sorted(s.items())) for s in spans])
                for d, spans in zip(df.doc_id, df.spans)]

    base = norm(build_out_docs(rd.from_arrow(corpus)))
    hooked = norm(build_out_docs(rd.from_arrow(corpus),
                                 span_stages=[lambda b: b]))
    assert hooked == base


def test_text_rewrite_stage_applies_to_detected_only(ray_session):
    import ray.data as rd

    from ctdray.pipelines.extract import build_out_docs

    corpus = make_corpus(8)
    out = build_out_docs(rd.from_arrow(corpus),
                         span_stages=[_upper_stage()]).to_pandas()
    n_detected = n_orig_text = 0
    for spans in out.spans:
        for s in spans:
            if s["kind"] == "text_line":
                assert s["text"] == s["text"].upper()
                n_detected += 1
            elif s["kind"] == "text" and s["text"]:
                # original document text is untouched by the stage
                if s["text"] != s["text"].upper():
                    n_orig_text += 1
    assert n_detected > 0 and n_orig_text > 0


def test_filter_stage_drops_rows_but_keeps_splice(ray_session):
    import ray.data as rd

    from ctdray.pipelines.extract import build_out_docs

    corpus = make_corpus(8)
    base = build_out_docs(rd.from_arrow(corpus)).to_pandas()
    only_first = build_out_docs(rd.from_arrow(corpus),
                                span_stages=[_first_line_only()]).to_pandas()
    base_pages_with_lines = sum(
        1 for spans in base.spans
        for s in spans if s["kind"] == "text_line" and s["order"] == 0)
    kept = [s for spans in only_first.spans for s in spans
            if s["kind"] == "text_line"]
    assert len(kept) == base_pages_with_lines > 0
    assert all(s["order"] == 0 for s in kept)
    # originals fully preserved
    n_orig_base = sum(1 for spans in base.spans
                      for s in spans if s["kind"] != "text_line")
    n_orig_hook = sum(1 for spans in only_first.spans
                      for s in spans if s["kind"] != "text_line")
    assert n_orig_base == n_orig_hook


def test_stages_compose_in_order(ray_session):
    import ray.data as rd

    from ctdray.pipelines.extract import build_detected_spans

    corpus = make_corpus(6)
    ds = build_detected_spans(rd.from_arrow(corpus),
                              span_stages=[_first_line_only(), _upper_stage()])
    df = ds.to_pandas()
    assert len(df) > 0
    assert (df["order"] == 0).all()
    assert (df["text"] == df["text"].str.upper()).all()

"""Annotation round trip (SURVEY.md §3.2 — traverse_by_dict parity).

The reference's model2annotations writes per-image JSON blocks + a mask png,
and traverse_by_dict proves that pair is sufficient to resume refinement
without the model (inference.py:180-200).  Engine equivalent:
``build_annotations`` (ANNOTATION_SCHEMA rows) → ``refine_from_annotations``
(detector-free K1-K5 re-refinement).  These tests pin:

  - the distributed resume path equals a single-process re-refinement over
    the same saved rows (bit-identical mask bytes);
  - block structs hydrate losslessly through the annotation table;
  - poison-pill refs degrade to dropped rows, never crash.
"""
import numpy as np
import pyarrow as pa
import pytest

from ctdray.config import PipelineConfig
from ctdray.fixtures import make_corpus


def _sorted_pd(df):
    return df.sort_values(["doc_id", "media_offset"]).reset_index(drop=True)


def test_refine_from_annotations_matches_single_process(ray_session):
    import ray.data as rd

    from ctdray.pipelines.extract import (build_annotations,
                                          refine_from_annotations)
    from ctdray.stages.multimodal import decode_image
    from ctdray.stages.refine import refine_from_annotations_task
    from ctdray.textblock import TextBlock

    corpus = make_corpus(10)
    cfg = PipelineConfig()
    ann = build_annotations(rd.from_arrow(corpus), cfg).to_pandas()
    assert len(ann) > 0
    assert (ann["blocks"].map(len) > 0).any()

    ann_tbl = pa.Table.from_pandas(ann, preserve_index=False)
    # distributed resume
    got = refine_from_annotations(
        rd.from_arrow(ann_tbl), cfg).to_pandas()
    # single-process resume over the same rows (same task fn, one batch)
    want = refine_from_annotations_task(ann_tbl, cfg=cfg).to_pandas()
    got, want = _sorted_pd(got), _sorted_pd(want)
    assert len(got) == len(want) == len(ann)
    assert list(got["mask"]) == list(want["mask"])        # byte-identical
    assert list(got["fg_pixels"]) == list(want["fg_pixels"])
    assert list(got["n_blocks"]) == list(ann["blocks"].map(len))


def test_annotation_blocks_hydrate_losslessly(ray_session):
    import ray.data as rd

    from ctdray.pipelines.extract import build_annotations
    from ctdray.textblock import TextBlock

    def _plain(v):
        if hasattr(v, "tolist"):
            v = v.tolist()
        if isinstance(v, list):
            return [_plain(x) for x in v]
        return v

    ann = build_annotations(rd.from_arrow(make_corpus(6))).to_pandas()
    n_blocks = 0
    for structs in ann["blocks"]:
        for d in structs:
            d = {k: _plain(v) for k, v in d.items()}
            blk = TextBlock.from_struct(d)
            rt = blk.to_struct(order=d["order"])
            assert rt == d
            n_blocks += 1
    assert n_blocks > 0


def test_refine_from_annotations_poison_pill(ray_session):
    from ctdray.schema import ANNOTATION_SCHEMA
    from ctdray.stages.refine import refine_from_annotations_task

    bad = pa.Table.from_pylist([{
        "doc_id": "d0", "media_offset": 0,
        "media_ref": "page://nonsense/NOT-A-REF",
        "mask": b"garbage", "mask_h": 4, "mask_w": 4, "blocks": [],
    }], schema=ANNOTATION_SCHEMA)
    out = refine_from_annotations_task(bad, cfg=PipelineConfig())
    assert out.num_rows == 0


def test_annotation_saved_mask_equals_mask_sink(ray_session):
    """The annotation row's saved mask is the SAME refined mask the
    mask-sink pipeline writes (the reference saves one mask-<name>.png used
    by both consumers)."""
    import ray.data as rd

    from ctdray.pipelines.extract import (build_annotations,
                                          build_refined_masks)

    corpus = make_corpus(8)
    ann = _sorted_pd(build_annotations(rd.from_arrow(corpus)).to_pandas())
    sink = _sorted_pd(build_refined_masks(rd.from_arrow(corpus)).to_pandas())
    assert list(ann["mask"]) == list(sink["mask"])

"""Split (prod GPU) detect layout — SURVEY.md §2.4 A1 split-mode promise:
the DetectInfer actor emits raw tensor rows (schema.TENSOR_PAGE_SCHEMA) and a
stateless CPU pool runs NMS/representer/grouping.  Spans/blocks/out-docs must
be EQUAL to the fused path on the surrogate backend, fp32 and fp16 maps."""
import numpy as np
import pyarrow as pa
import pytest

from ctdray.config import PipelineConfig
from ctdray.fixtures import make_corpus
from ctdray.schema import TENSOR_PAGE_SCHEMA

SPAN_KEY = ["doc_id", "offset", "kind", "text", "media_ref", "order"]


@pytest.fixture(scope="module")
def corpus_tbl():
    return make_corpus(12)


def _spans_df(ds):
    df = ds.to_pandas()
    return df[SPAN_KEY].sort_values(SPAN_KEY).reset_index(drop=True)


def test_split_spans_equal_fused(ray_session, corpus_tbl):
    import ray.data as rd

    from ctdray.pipelines.extract import build_detected_spans

    fused = _spans_df(build_detected_spans(rd.from_arrow(corpus_tbl)))
    split = _spans_df(build_detected_spans(
        rd.from_arrow(corpus_tbl), PipelineConfig(detect_layout="split")))
    assert len(fused) > 0
    assert split.equals(fused)


def test_split_actor_pool_spans_equal(ray_session, corpus_tbl):
    """detect_compute='actors' forces the infer ACTOR POOL (the prod GPU
    shape: weights once per actor, pool sized by _infer_concurrency) — spans
    must equal the fused path exactly like the default task mode."""
    import ray.data as rd

    from ctdray.pipelines.extract import build_detected_spans

    fused = _spans_df(build_detected_spans(rd.from_arrow(corpus_tbl)))
    pool = _spans_df(build_detected_spans(
        rd.from_arrow(corpus_tbl),
        PipelineConfig(detect_layout="split", detect_compute="actors",
                       infer_concurrency=2)))
    assert pool.equals(fused)


def test_split_half_maps_spans_equal(ray_session, corpus_tbl):
    import ray.data as rd

    from ctdray.pipelines.extract import build_detected_spans

    fused = _spans_df(build_detected_spans(rd.from_arrow(corpus_tbl)))
    half = _spans_df(build_detected_spans(
        rd.from_arrow(corpus_tbl),
        PipelineConfig(detect_layout="split", half_maps=True)))
    assert half.equals(fused)


def test_split_out_docs_equal_fused(ray_session, corpus_tbl):
    import ray.data as rd

    from ctdray.pipelines.extract import build_out_docs

    def norm(ds):
        df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
        return [(d, [tuple(sorted(s.items())) for s in spans])
                for d, spans in zip(df.doc_id, df.spans)]

    fused = norm(build_out_docs(rd.from_arrow(corpus_tbl)))
    split = norm(build_out_docs(rd.from_arrow(corpus_tbl),
                                PipelineConfig(detect_layout="split")))
    assert split == fused


def test_split_blocks_equal_fused(ray_session, corpus_tbl):
    import ray.data as rd

    from ctdray.pipelines.extract import build_blocks

    def norm(ds):
        df = ds.to_pandas()
        recs = [(r.media_ref, r.block["order"], tuple(r.block["xyxy"]),
                 tuple(map(tuple, r.block["lines"])), r.block["language"])
                for r in df.itertuples()]
        return sorted(recs)

    fused = norm(build_blocks(rd.from_arrow(corpus_tbl)))
    split = norm(build_blocks(rd.from_arrow(corpus_tbl),
                              PipelineConfig(detect_layout="split")))
    assert len(fused) > 0
    assert split == fused


def test_infer_postprocess_unit_roundtrip(corpus_tbl):
    """No-Ray unit: DetectInfer rows obey TENSOR_PAGE_SCHEMA (maps cropped
    to the un-padded region, fp16 honoured) and postprocess_task reproduces
    the fused stage's spans exactly — postprocess constructs NO detector."""
    from ctdray.stages.decode import DecodeStage
    from ctdray.stages.detect import (DetectExtract, DetectInfer,
                                      postprocess_task)
    from ctdray.stages.explode import explode_media_spans

    pages = DecodeStage()(explode_media_spans(corpus_tbl.slice(0, 4)))
    tensors = DetectInfer()(pages)
    assert tensors.schema.equals(TENSOR_PAGE_SCHEMA)
    assert tensors.num_rows > 0
    cfg = PipelineConfig()
    size = cfg.detector.input_size
    for i in range(tensors.num_rows):
        mh = tensors.column("map_h")[i].as_py()
        mw = tensors.column("map_w")[i].as_py()
        assert 0 < mh <= size and 0 < mw <= size
        assert mh == size or mw == size      # letterbox pads one axis only
        # detection maps are mostly background → the sparse codec engages
        # for both planes (mode bits 0b11) and ships far fewer bytes than
        # the two dense fp32 maps
        assert tensors.column("maps_mode")[i].as_py() == 0b11
        raw = tensors.column("maps")[i].as_py()
        runs = tensors.column("maps_runs")[i].as_py()
        # empty (all-zero) maps encode to zero bytes; text pages to ≪ dense
        assert len(raw) + len(runs) < 2 * mh * mw * 4 // 4
    assert any(len(tensors.column("maps")[i].as_py()) > 0
               for i in range(tensors.num_rows))
    got = postprocess_task(tensors).to_pylist()
    exp = DetectExtract()(pages).to_pylist()
    key = lambda r: tuple(r[k] for k in SPAN_KEY)
    assert sorted(got, key=key) == sorted(exp, key=key)

    half = DetectInfer(half=True)(pages)
    got_h = postprocess_task(half).to_pylist()
    assert sorted(got_h, key=key) == sorted(exp, key=key)


def test_tensorcodec_roundtrip_exact():
    """encode_map/decode_map are value-exact in both modes, including the
    dense fallback on dense-nonzero (prod sigmoid) maps."""
    from ctdray.tensorcodec import decode_map, encode_map

    rng = np.random.default_rng(7)
    sparse_map = np.zeros((640, 1024), np.float32)
    sparse_map[100:140, 200:500] = rng.random((40, 300)).astype(np.float32)
    sparse_map[0, 0] = 0.5                    # run touching the origin
    sparse_map[-1, -1] = 0.25                 # and the last pixel
    dense_map = rng.random((64, 64)).astype(np.float16) + np.float16(0.01)
    zero_map = np.zeros((8, 8), np.float32)
    for arr in (sparse_map, dense_map, zero_map):
        sp, runs, vals = encode_map(arr)
        out = decode_map(sp, runs, vals, arr.shape, arr.dtype)
        assert out.dtype == arr.dtype and np.array_equal(out, arr)
    sp, runs, vals = encode_map(sparse_map)
    assert sp and len(runs) + len(vals) < sparse_map.nbytes // 10
    sp, _, _ = encode_map(dense_map)
    assert not sp                              # dense fallback engaged


def test_tensorcodec_store_dtype_and_stacked():
    """The fp16 wire path: fp32 compute arrays in, fp16 stored values, fp32
    decode out — only the stored values are quantized.  Also covers the
    stacked (2, h, w) two-map layout the split stage ships."""
    from ctdray.tensorcodec import decode_map, encode_map

    rng = np.random.default_rng(11)
    maps = np.zeros((2, 320, 512), np.float32)
    maps[0, 40:80, 100:300] = rng.random((40, 200)).astype(np.float32)
    maps[1, 200:260, 50:450] = rng.random((60, 400)).astype(np.float32)
    sp, runs, vals = encode_map(maps, store_dtype=np.float16)
    assert sp
    out = decode_map(sp, runs, vals, maps.shape, np.float16,
                     out_dtype=np.float32)
    assert out.dtype == np.float32 and out.shape == maps.shape
    # exactly the fp16 quantization of the nonzero values, zeros untouched
    assert np.array_equal(out, maps.astype(np.float16).astype(np.float32))
    assert np.array_equal(out == 0, maps == 0)
    # dense fallback honours store_dtype too
    dense = rng.random((2, 64, 64)).astype(np.float32) + 0.01
    sp, runs, vals = encode_map(dense, store_dtype=np.float16)
    assert not sp and len(vals) == dense.size * 2
    out = decode_map(sp, runs, vals, dense.shape, np.float16,
                     out_dtype=np.float32)
    assert np.array_equal(out, dense.astype(np.float16).astype(np.float32))
    # negative zero is preserved bitwise (int-view nonzero detection)
    nz = np.zeros((4, 4), np.float32)
    nz[1, 1] = -0.0
    sp, runs, vals = encode_map(nz)
    out = decode_map(sp, runs, vals, nz.shape, np.float32)
    assert np.array_equal(out, nz)


def test_page_maps_codec():
    """encode_page_maps/decode_page_maps: the split stage's two-maps-one-call
    codec — full-size sparse planes (pad ships free), per-plane dense-crop
    fallback for dense-nonzero (prod sigmoid) maps, fp16 wire values."""
    from ctdray.tensorcodec import decode_page_maps, encode_page_maps

    rng = np.random.default_rng(5)
    S, ch, cw = 256, 256, 192          # letterbox pads the width axis only
    mask = np.zeros((S, S), np.float32)
    mask[30:90, 10:180] = rng.random((60, 170)).astype(np.float32)
    lines = np.zeros((S, S), np.float32)
    lines[200:240, 60:150] = rng.random((40, 90)).astype(np.float32)

    # both sparse, fp32 wire
    mode, runs, vals = encode_page_maps((mask, lines), ch, cw)
    assert mode == 0b11
    out = decode_page_maps(mode, runs, vals, ch, cw, np.float32)
    assert out.shape == (2, S, S)
    assert np.array_equal(out[0], mask) and np.array_equal(out[1], lines)

    # fp16 wire, fp32 out: exactly the fp16 quantization of the values
    mode, runs, vals = encode_page_maps((mask, lines), ch, cw,
                                        store_dtype=np.float16)
    out = decode_page_maps(mode, runs, vals, ch, cw, np.float16,
                           out_dtype=np.float32)
    assert out.dtype == np.float32
    assert np.array_equal(out[0], mask.astype(np.float16).astype(np.float32))
    assert np.array_equal(out[1], lines.astype(np.float16).astype(np.float32))

    # mixed: dense-nonzero plane falls back to a dense CROP; pad never ships
    dense = rng.random((S, S)).astype(np.float32) + 0.01
    mode, runs, vals = encode_page_maps((dense, lines), ch, cw)
    assert mode == 0b10                # plane 0 dense, plane 1 sparse
    n_dense = ch * cw * 4
    assert len(vals) > n_dense         # dense crop + sparse values
    out = decode_page_maps(mode, runs, vals, ch, cw, np.float32)
    assert np.array_equal(out[0, :ch, :cw], dense[:ch, :cw])
    assert np.all(out[0, :, cw:] == 0)  # pad region reconstructed as zeros
    assert np.array_equal(out[1], lines)

    # both dense
    mode, runs, vals = encode_page_maps((dense, dense), ch, cw,
                                        store_dtype=np.float16)
    assert mode == 0 and runs == b"" and len(vals) == 2 * ch * cw * 2
    out = decode_page_maps(mode, runs, vals, ch, cw, np.float16,
                           out_dtype=np.float32)
    exp = dense[:ch, :cw].astype(np.float16).astype(np.float32)
    assert np.array_equal(out[0, :ch, :cw], exp)
    assert np.array_equal(out[1, :ch, :cw], exp)

    # all-zero planes: zero bytes on the wire
    z = np.zeros((S, S), np.float32)
    mode, runs, vals = encode_page_maps((z, z), ch, cw)
    assert mode == 0b11 and runs == b"" and vals == b""
    assert np.array_equal(decode_page_maps(mode, runs, vals, ch, cw,
                                           np.float32), np.zeros((2, S, S)))


def test_infer_pool_sizing_gpu_math():
    """_infer_concurrency: GPU-resourced pool sizes to the GPU fleet."""
    from ctdray.pipelines.extract import _infer_concurrency

    assert _infer_concurrency(PipelineConfig(infer_concurrency=7)) == 7
    # CPU fallback leaves cores for the stateless postprocess drain.
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() \
        else None
    if cpus:
        got = _infer_concurrency(PipelineConfig(detect_layout="split"))
        assert 2 <= got < cpus


def test_split_doc_carrying_unit_roundtrip(corpus_tbl):
    """No-Ray unit for the doc-carrying split pair: DetectInferDoc rows obey
    TENSOR_DOC_SCHEMA and postprocess_doc_task reproduces the fused
    DetectSpliceDoc output exactly, fp32 and fp16, including an undecodable
    media ref passing through without detections."""
    import pyarrow as pa

    from ctdray.schema import DOC_SCHEMA, TENSOR_DOC_SCHEMA
    from ctdray.stages.detect import (DetectInferDoc, DetectSpliceDoc,
                                      postprocess_doc_task)

    batch = corpus_tbl.slice(0, 6)
    exp = DetectSpliceDoc()(batch).to_pylist()

    tensors = DetectInferDoc()(batch)
    assert tensors.schema.equals(TENSOR_DOC_SCHEMA)
    assert tensors.num_rows == batch.num_rows
    got = postprocess_doc_task(tensors).to_pylist()
    assert got == exp

    half = DetectInferDoc(half=True)(batch)
    assert postprocess_doc_task(half).to_pylist() == exp

    bad = pa.Table.from_pylist([{
        "doc_id": "doc-x", "spans": [
            {"kind": "media", "text": "", "media_ref": "bogus://", "offset": 0},
            {"kind": "text", "text": "t", "media_ref": "", "offset": 1},
        ]}], schema=DOC_SCHEMA)
    t = DetectInferDoc()(bad)
    assert t.column("pages")[0].as_py() == []       # no payload for bogus ref
    out = postprocess_doc_task(t).to_pylist()
    assert [s["kind"] for s in out[0]["spans"]] == ["media", "text"]
    assert out == DetectSpliceDoc()(bad).to_pylist()


def test_split_dense_tail_hybrid_equal_fused(ray_session, corpus_tbl):
    """Split layout with a FORCED dense tail (threshold 2): doc-carrying
    zero-shuffle path and page-level groupby splice both active; out-docs
    must equal the fused pipeline's."""
    import ray.data as rd

    from ctdray.pipelines.extract import build_out_docs

    def norm(ds):
        df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
        return [(d, [tuple(sorted(s.items())) for s in spans])
                for d, spans in zip(df.doc_id, df.spans)]

    fused = norm(build_out_docs(rd.from_arrow(corpus_tbl)))
    split = norm(build_out_docs(
        rd.from_arrow(corpus_tbl),
        PipelineConfig(detect_layout="split", dense_media_threshold=2,
                       infer_concurrency=2)))
    assert split == fused


def test_page_maps_codec_paint_rects_hint():
    """encode_page_maps ``paint_rects``: runs built from painter geometry
    (no plane scan) decode to the identical maps — including superset rects
    (extra in-run pixels ship as zeros), overlapping rects (interval union),
    empty rect lists, fp16 wire, and the dense fallback when the rect union
    is too large for sparse."""
    from ctdray.tensorcodec import decode_page_maps, encode_page_maps

    rng = np.random.default_rng(11)
    S, ch, cw = 256, 256, 192
    mask = np.zeros((S, S), np.float32)
    mask[30:90, 10:180] = rng.random((60, 170)).astype(np.float32)
    lines = np.zeros((S, S), np.float32)
    lines[200:240, 60:150] = rng.random((40, 90)).astype(np.float32)
    lines[210:220, 100:120] = 0.0      # holes INSIDE the painted rect

    exact = [(30, 90, 10, 180)]
    superset = [(27, 93, 7, 183)]      # bounds + margin, under the sparse
                                       # threshold (66·176 < 0.25·ch·cw)
    overlapping = [(200, 225, 60, 150), (215, 240, 60, 150),
                   (205, 210, 60, 150)]                  # union = the rect
    for m_rects, l_rects in ((exact, [(200, 240, 60, 150)]),
                             (superset, overlapping)):
        mode, runs, vals = encode_page_maps(
            (mask, lines), ch, cw, paint_rects=(m_rects, l_rects))
        assert mode == 0b11
        out = decode_page_maps(mode, runs, vals, ch, cw, np.float32)
        assert np.array_equal(out[0], mask)
        assert np.array_equal(out[1], lines)

    # fp16 wire via the hint path
    mode, runs, vals = encode_page_maps((mask, lines), ch, cw,
                                        store_dtype=np.float16,
                                        paint_rects=(superset, overlapping))
    out = decode_page_maps(mode, runs, vals, ch, cw, np.float16,
                           out_dtype=np.float32)
    assert np.array_equal(out[0], mask.astype(np.float16).astype(np.float32))
    assert np.array_equal(out[1], lines.astype(np.float16).astype(np.float32))

    # empty rect lists == all-zero planes, zero wire bytes
    z = np.zeros((S, S), np.float32)
    mode, runs, vals = encode_page_maps((z, z), ch, cw, paint_rects=([], []))
    assert mode == 0b11 and runs == b"" and vals == b""
    assert np.array_equal(
        decode_page_maps(mode, runs, vals, ch, cw, np.float32),
        np.zeros((2, S, S)))

    # a whole-canvas rect union exceeds the sparse threshold → dense crop,
    # same as the scan path would decide for a dense plane
    dense = rng.random((S, S)).astype(np.float32) + 0.01
    dense[:, cw:] = 0.0                # pad region stays zero
    mode, runs, vals = encode_page_maps((dense, lines), ch, cw,
                                        paint_rects=([(0, S, 0, cw)],
                                                     overlapping))
    assert mode == 0b10
    out = decode_page_maps(mode, runs, vals, ch, cw, np.float32)
    assert np.array_equal(out[0, :ch, :cw], dense[:ch, :cw])
    assert np.array_equal(out[1], lines)

    # per-plane None falls back to the scan for that plane only
    mode_h, runs_h, vals_h = encode_page_maps(
        (mask, lines), ch, cw, paint_rects=(None, overlapping))
    out = decode_page_maps(mode_h, runs_h, vals_h, ch, cw, np.float32)
    assert np.array_equal(out[0], mask)
    assert np.array_equal(out[1], lines)


def test_surrogate_exposes_paint_rects_and_payload_uses_them():
    """The surrogate records per-call paint rects; the split payload built
    WITH the hint decodes to the same maps as a scan-based encode."""
    from ctdray.config import DetectorConfig
    from ctdray.detect_core import infer_page_planes
    from ctdray.surrogate import SurrogateDetector
    from ctdray.tensorcodec import decode_page_maps, encode_page_maps
    from ctdray.fixtures import make_media_ref
    from ctdray.sources.media import decode_page

    cfg = DetectorConfig()
    for reuse in (True, False):
        det = SurrogateDetector(cfg, reuse_buffers=reuse)
        for i in range(4):
            ref = make_media_ref(doc_id=i * 53 + 9, offset=i)
            img = decode_page(ref)
            h, w = img.shape[:2]
            blks, m, l0, chh, cww = infer_page_planes(det, ref, h, w, cfg)
            rects = det.last_paint_rects
            assert isinstance(rects, tuple) and len(rects) == 2
            hinted = encode_page_maps((m, l0), chh, cww, paint_rects=rects)
            scanned = encode_page_maps((m, l0), chh, cww)
            out_h = decode_page_maps(hinted[0], hinted[1], hinted[2],
                                     chh, cww, np.float32)
            out_s = decode_page_maps(scanned[0], scanned[1], scanned[2],
                                     chh, cww, np.float32)
            np.testing.assert_array_equal(out_h, out_s)


def test_split_payload_wire_size_bounded():
    """Regression guard for the split-layout wire footprint: a typical
    fixture page's codec'd payload must stay far below the raw-map size
    (~12 MB fp32) — the measured fleet average is ~0.12 MB/page fp16.  A
    codec regression to dense shipping would blow past this immediately."""
    import numpy as np

    from ctdray.config import DetectorConfig, PipelineConfig
    from ctdray.fixtures import make_media_ref
    from ctdray.sources.media import decode_page
    from ctdray.stages.detect import _infer_page_payload
    from ctdray.surrogate import SurrogateDetector

    cfg = PipelineConfig()
    det = SurrogateDetector(cfg.detector)
    total = 0
    n = 6
    for i in range(n):
        ref = make_media_ref(doc_id=i * 67 + 21, offset=i % 3)
        img = decode_page(ref)
        p = _infer_page_payload(det, cfg.detector, ref,
                                img.shape[0], img.shape[1], half=True)
        total += len(p["maps"]) + len(p["maps_runs"]) + len(p["blks"])
    mean_mb = total / n / 1e6
    assert mean_mb < 1.0, f"split payload regressed to {mean_mb:.2f} MB/page"

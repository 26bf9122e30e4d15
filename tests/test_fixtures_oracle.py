"""Fixture generator + oracle determinism and scenario coverage
(FIXTURES.md §2-§4)."""
import numpy as np
import pyarrow.compute as pc

from ctdray.config import DetectorConfig
from ctdray.detect_core import detect_page, page_line_spans
from ctdray.fixtures import make_corpus, make_media_ref, page_ground_truth, render_page
from ctdray.oracle import flatten_out_docs, run_oracle
from ctdray.sources.media import decode_pgm, encode_pgm, fetch_media
from ctdray.surrogate import SurrogateDetector


def test_corpus_deterministic_and_schema():
    a, b = make_corpus(20), make_corpus(20)
    assert a.equals(b)
    assert a.column_names == ["doc_id", "spans"]
    spans = [s for r in a.to_pylist() for s in r["spans"]]
    kinds = {s["kind"] for s in spans}
    assert kinds == {"text", "media"}
    for r in a.to_pylist():
        offs = [s["offset"] for s in r["spans"]]
        assert offs == list(range(len(offs)))


def test_page_gt_deterministic_and_varied():
    refs = [make_media_ref(f"doc-{i:08d}", j) for i in range(30) for j in range(2)]
    gts = [page_ground_truth(r) for r in refs]
    gts2 = [page_ground_truth(r) for r in refs]
    for g1, g2 in zip(gts, gts2):
        assert g1.page_w == g2.page_w
        for b1, b2 in zip(g1.blocks, g2.blocks):
            np.testing.assert_array_equal(b1.lines, b2.lines)
    # scenario coverage across the pool
    assert any(len(g.blocks) == 0 for g in gts)              # empty page
    assert any(len(g.blocks) >= 12 for g in gts)             # dense page
    assert any(g.page_w > g.page_h for g in gts)             # wide page
    assert any(not b.detected for g in gts for b in g.blocks)     # scattered lines
    assert any(not b.in_lines_map for g in gts for b in g.blocks) # mask-only block
    assert any(b.vertical for g in gts for b in g.blocks)
    assert any(g.noise_regions for g in gts)
    assert any(g.empty_boxes for g in gts)


def test_pgm_roundtrip():
    img = (np.arange(600, dtype=np.int64).reshape(20, 30) % 256).astype(np.uint8)
    assert np.array_equal(decode_pgm(encode_pgm(img)), img)
    # malformed payloads raise ValueError (poison-pill contract);
    # a maxval-65535 file is VALID 16-bit PGM now — truncate it instead
    for bad in [b"nope", b"P5\n10 10\n255\nxx",
                b"P5\n10 10\n65535\n" + b"x" * 150]:
        try:
            decode_pgm(bad)
            raise AssertionError("should have raised")
        except ValueError:
            pass
    # and the full-length 16-bit payload decodes (high-byte strip)
    full16 = decode_pgm(b"P5\n10 10\n65535\n" + b"xy" * 100)
    assert full16.shape == (10, 10) and (full16 == ord("x")).all()


def test_render_matches_gt_geometry():
    ref = make_media_ref("doc-00000003", 1)
    gt = page_ground_truth(ref)
    img = decode_pgm(fetch_media(ref))
    assert img.shape == (gt.page_h, gt.page_w)
    for blk in gt.blocks[:3]:
        q = blk.lines[0]
        cy, cx = int(q[:, 1].mean()), int(q[:, 0].mean())
        assert img[cy, cx] == gt.fg_level


def test_detect_page_deterministic():
    cfg = DetectorConfig()
    det = SurrogateDetector(cfg)
    ref = next(r for r in (make_media_ref(f"doc-{i:08d}", 0) for i in range(20))
               if len(page_ground_truth(r).blocks) >= 2)
    img = decode_pgm(fetch_media(ref))
    b1, _ = detect_page(det, ref, img.shape[0], img.shape[1], cfg)
    b2, _ = detect_page(det, ref, img.shape[0], img.shape[1], cfg)
    s1, s2 = page_line_spans(b1), page_line_spans(b2)
    assert s1 == s2 and len(s1) > 0


def test_oracle_splice_preserves_original_spans():
    docs = make_corpus(6)
    out = run_oracle(docs)
    flat = flatten_out_docs(out)
    orig = flat.filter(pc.equal(flat["order"], -1))
    # original spans survive exactly, in offset order per doc
    src = [(r["doc_id"], s["offset"], s["kind"], s["text"])
           for r in docs.to_pylist() for s in r["spans"]]
    got = [(r["doc_id"], r["offset"], r["kind"], r["text"])
           for r in orig.to_pylist()]
    assert got == src
    # detected spans follow their media span and have order 0..n-1 per page
    tl = flat.filter(pc.equal(flat["kind"], "text_line")).to_pylist()
    assert len(tl) > 0
    by_page = {}
    for r in tl:
        by_page.setdefault(r["media_ref"], []).append(r["order"])
    for orders in by_page.values():
        assert orders == list(range(len(orders)))

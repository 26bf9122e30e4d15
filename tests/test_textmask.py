"""K1-K5 mask refinement (reference utils/textmask.py semantics in numpy)."""
import numpy as np
import pytest

from ctdray import textmask as tm
from ctdray.fixtures import make_corpus, make_media_ref, page_ground_truth, render_page
from ctdray.geom import fill_convex_poly
from ctdray.textblock import TextBlock


def test_morphology_rect_and_cross():
    img = np.zeros((7, 7), np.uint8)
    img[3, 3] = 255
    d = tm.dilate3(img, "rect")
    assert d[2:5, 2:5].min() == 255 and d.sum() == 255 * 9
    dc = tm.dilate3(img, "cross")
    assert dc[3, 2:5].min() == 255 and dc[2, 3] == 255 and dc.sum() == 255 * 5
    # erosion undoes the dilation for an isolated square
    assert tm.erode3(d, "rect").sum() == 255
    # constant border: a full-frame image survives erosion at the edges
    full = np.full((5, 5), 255, np.uint8)
    assert tm.erode3(full, "rect").min() == 255


def test_minxor_polarity():
    mask = np.zeros((10, 10), np.uint8)
    mask[2:8, 2:8] = 255
    # threshed is the inverse of the mask → the negative wins
    threshed = 255 - mask
    got, xor = tm.minxor_thresh(threshed, mask)
    assert np.array_equal(got, mask) and xor == 0


def test_get_topk_color_spacing():
    counts = np.zeros(255, np.int64)
    counts[[10, 12, 100, 200]] = [50, 45, 30, 20]
    edges = np.arange(256).astype(np.float64)
    top = tm.get_topk_color(edges, counts, k=3, color_var=10)
    # 12 is within color_var of 10 → skipped; 100 and 200 kept
    assert top[0] == 10 and 100 in top and 200 in top and 12 not in top


def test_merge_mask_list_keeps_xor_reducing_components_and_fills_holes():
    pred = np.zeros((40, 40), np.uint8)
    pred[5:20, 5:35] = 255
    # candidate 1: matches pred region plus a far-away noise blob
    cand = np.array(pred)
    cand[30:38, 30:38] = 255
    # candidate with a hole inside the text region
    ring = np.array(pred)
    ring[10:15, 10:30] = 0
    merged = tm.merge_mask_list([[ring, 1], [cand, 2]], np.array(pred),
                                refine_mode=tm.REFINEMASK_ANNOTATION)
    # the noise blob increases XOR → rejected
    assert merged[30:38, 30:38].max() == 0
    # the hole is interior background smaller than the outer background → filled
    assert merged[11:14, 11:29].min() == 255


def test_refine_mask_recovers_line_rects_on_fixture_page():
    ref = make_media_ref("doc-00000000", 0)
    gt = page_ground_truth(ref)
    img = render_page(gt)
    detected = [b for b in gt.blocks if b.detected]
    if not detected:
        pytest.skip("fixture page has no detected blocks")
    pred = np.zeros_like(img)
    blks = []
    for b in detected:
        for quad in b.lines:
            fill_convex_poly(pred, quad, 255)
        x1, y1, x2, y2 = b.bbox
        blks.append(TextBlock([int(x1), int(y1), int(x2), int(y2)]))
    refined = tm.refine_mask(img, pred, blks,
                             refine_mode=tm.REFINEMASK_ANNOTATION)
    inter = int(((refined > 0) & (pred > 0)).sum())
    assert inter / max(1, int((pred > 0).sum())) > 0.8   # recovers the glyphs
    # determinism
    refined2 = tm.refine_mask(img, pred, blks,
                              refine_mode=tm.REFINEMASK_ANNOTATION)
    assert np.array_equal(refined, refined2)


def test_refined_masks_pipeline(ray_session):
    import ray.data as rd

    from ctdray.pipelines.extract import build_refined_masks
    from ctdray.stages.multimodal import decode_image

    tbl = make_corpus(6)
    out = build_refined_masks(rd.from_arrow(tbl)).to_pandas()
    assert len(out) > 0
    assert {"doc_id", "media_ref", "mask", "mask_h", "mask_w",
            "fg_pixels", "n_blocks"} <= set(out.columns)
    row = out.iloc[0]
    assert bytes(row["mask"][:8]) == b"\x89PNG\r\n\x1a\n"   # reference format
    m = decode_image(row["mask"])
    assert m.shape == (row["mask_h"], row["mask_w"])
    assert (m > 0).sum() == row["fg_pixels"]
    assert (out["n_blocks"] > 0).any()


def test_hole_fill_threshold_includes_text_area_complement():
    """ADVICE r1: cv2's hole-fill area list includes label 0 (the text area).
    A single large interior hole beats the second-largest *hole* but not the
    text area — it must still be filled."""
    pred = np.zeros((40, 40), np.uint8)
    pred[4:34, 4:34] = 255                 # solid 30×30 text region
    cand = np.array(pred)
    cand[10:20, 10:20] = 0                 # one 100-px interior hole
    merged = tm.merge_mask_list([[cand, 0]], np.array(pred),
                                refine_mode=tm.REFINEMASK_ANNOTATION)
    # inverse components: outer background (~700 px) + the hole (100 px);
    # with the text-area complement (≈900 px) in the list the threshold is
    # the outer background, so the hole (smaller) gets filled.
    assert merged[12:18, 12:18].min() == 255


def test_refine_undetected_mask_keeps_first_region():
    """ADVICE r1: the reference's valid_labels[1:] drops cv2's background
    label, not a real region — every uncovered text region must be
    recovered, including the first."""
    img = np.full((80, 80), 255, np.uint8)
    pred = np.zeros((80, 80), np.uint8)
    # two disjoint predicted-text regions, dark glyph boxes in the image
    pred[10:25, 10:40] = 255
    pred[50:65, 30:70] = 255
    img[10:25, 10:40] = 0
    img[50:65, 30:70] = 0
    refined = tm.refine_undetected_mask(img, pred, np.zeros_like(pred),
                                        [], refine_mode=tm.REFINEMASK_ANNOTATION)
    # both regions recovered (no block covers them)
    assert refined[12:23, 12:38].mean() > 128
    assert refined[52:63, 32:68].mean() > 128

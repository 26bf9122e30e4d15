"""TextBlock heuristics: orientation vote, distances, merge/split boundaries,
reading order — edge cases from SURVEY.md §5 (thresholds at
utils/textblock.py:344-373, 390-419)."""
import numpy as np

from ctdray.textblock import (
    TextBlock,
    examine_textblk,
    group_output,
    merge_textlines,
    sort_textblk_list,
    split_textblk,
    try_merge_textline,
)


def hline(x, y, length, fs):
    """Horizontal line quad [tl,tr,br,bl]."""
    return np.array([[x, y], [x + length, y], [x + length, y + fs], [x, y + fs]],
                    dtype=np.int32)


def vline(x, y, length, fs):
    """Vertical line quad (column of width fs)."""
    return np.array([[x, y], [x + fs, y], [x + fs, y + length], [x, y + length]],
                    dtype=np.int32)


def test_examine_horizontal_eng():
    lines = [hline(100, 100 + i * 40, 200, 20) for i in range(3)]
    blk = TextBlock([90, 90, 320, 230], lines, language="eng")
    examine_textblk(blk, 800, 600)
    assert not blk.vertical
    assert blk.font_size == 20           # norm_v / n_lines
    assert blk.angle == 0                # horizontal → atan2 ≈ 0
    # distances from origin (0,0) are the perpendicular (y) offsets, ascending
    assert np.all(np.diff(blk.distance) > 0)
    assert abs(blk.distance[0] - 110) < 1e-6   # center y of first line


def test_examine_vertical_ja_origin_right():
    # 3 columns, stacked right-to-left
    lines = [vline(300 - i * 40, 100, 200, 20) for i in range(3)]
    blk = TextBlock([200, 90, 340, 320], lines, language="ja")
    examine_textblk(blk, 800, 600)
    assert blk.vertical
    assert blk.font_size == 20
    assert blk.angle == 0                # −90 shift then snap
    # origin is (im_w, 0) → rightmost column has smallest distance
    assert blk.distance[0] < blk.distance[1] < blk.distance[2]


def test_examine_ja_asymmetry():
    # A square-ish single line: norm_v == norm_h → ja says horizontal (strict >),
    # eng needs norm_v > 2 norm_h so also horizontal; but a line slightly
    # taller than wide is vertical for ja yet still horizontal for eng
    # (utils/textblock.py:312-315).
    tall = [np.array([[0, 0], [20, 0], [20, 30], [0, 30]])]
    ja = TextBlock([0, 0, 20, 30], [tall[0].copy()], language="ja")
    examine_textblk(ja, 800, 600)
    assert ja.vertical
    eng = TextBlock([0, 0, 20, 30], [tall[0].copy()], language="eng")
    examine_textblk(eng, 800, 600)
    assert not eng.vertical


def test_angle_snap_below_3_degrees():
    # slightly tilted horizontal line: 2° → snapped to 0
    base = hline(100, 100, 200, 20).astype(np.float64)
    rad = np.deg2rad(2.0)
    c, s = np.cos(rad), np.sin(rad)
    center = base.mean(axis=0)
    rot = (base - center) @ np.array([[c, s], [-s, c]]) + center
    blk = TextBlock([0, 0, 400, 300], [rot.astype(np.int32)], language="eng")
    examine_textblk(blk, 800, 600)
    assert blk.angle == 0


def test_merge_font_ratio_gate():
    def single(y, fs):
        blk = TextBlock([0, 0, 0, 0], [hline(100, y, 200, fs)], language="eng")
        examine_textblk(blk, 800, 600)
        return blk

    a, b = single(100, 20), single(130, 20)
    assert try_merge_textline(a, b)
    assert b.merged and len(a.lines) == 2
    # font ratio > 1.3 → refuse (utils/textblock.py:357)
    c, d = single(100, 20), single(130, 27)
    assert not try_merge_textline(c, d)


def test_merge_distance_gate():
    def single(y):
        blk = TextBlock([0, 0, 0, 0], [hline(100, y, 200, 20)], language="eng")
        examine_textblk(blk, 800, 600)
        return blk

    near, far = single(100), single(100 + 3 * 20)   # > 2·fs center gap
    assert not try_merge_textline(near, far)


def test_merge_textlines_pass_merges_column():
    blks = []
    for i in range(3):
        blk = TextBlock([0, 0, 0, 0], [hline(100, 100 + i * 30, 200, 20)],
                        language="eng")
        examine_textblk(blk, 800, 600)
        blks.append(blk)
    merged = merge_textlines(blks)
    assert len(merged) == 1
    assert len(merged[0].lines) == 3
    assert merged[0].xyxy == [100, 100, 300, 180]


def test_split_on_gap():
    # vertical ja block: two columns near, then a big gap, then two more.
    lines = [vline(400, 100, 150, 20), vline(370, 100, 150, 20),
             vline(200, 100, 150, 20), vline(170, 100, 150, 20)]
    blk = TextBlock([160, 90, 430, 260], lines, language="ja")
    examine_textblk(blk, 800, 600, sort=True)
    did, subs = split_textblk(blk)
    assert did
    assert len(subs) == 2
    assert sorted(len(s.lines) for s in subs) == [2, 2]


def test_sort_reading_order_ltr_grid():
    def blk_at(x, y):
        b = TextBlock([x, y, x + 60, y + 20], [hline(x, y, 60, 20)], language="eng")
        examine_textblk(b, 600, 900)
        return b

    tl, tr, bl = blk_at(10, 10), blk_at(400, 10), blk_at(10, 700)
    out = sort_textblk_list([bl, tr, tl], 600, 900)
    assert [b.xyxy[0] for b in out] == [10, 400, 10]
    assert out[0].xyxy[1] == 10        # top-left first


def test_sort_reading_order_ja_rtl():
    def blk_at(x, language):
        b = TextBlock([x, 10, x + 60, 30], [hline(x, 10, 60, 20)], language=language)
        examine_textblk(b, 600, 900)
        return b

    left, right = blk_at(10, "ja"), blk_at(500, "ja")
    out = sort_textblk_list([left, right], 600, 900)
    assert out[0].xyxy[0] == 500       # majority-ja → right-to-left


def test_sort_wide_page_two_halves():
    # wide page (w>h): right half read as page 1... depends on flip; for
    # non-ja pages, left half first, blocks in the right half pushed after.
    def blk_at(x):
        b = TextBlock([x, 10, x + 60, 30], [hline(x, 10, 60, 20)], language="eng")
        examine_textblk(b, 1200, 800)
        return b

    right, left = blk_at(700), blk_at(10)
    out = sort_textblk_list([right, left], 1200, 800)
    assert out[0].xyxy[0] == 10


def test_group_output_end_to_end_assignment():
    im_w, im_h = 800, 600
    mask = np.zeros((im_h, im_w), dtype=np.uint8)
    lines = [hline(100, 100, 200, 20), hline(100, 130, 200, 20)]
    for q in lines:
        mask[q[0, 1]:q[2, 1], q[0, 0]:q[2, 0]] = 229
    boxes = np.array([[90, 90, 310, 160]], dtype=np.int32)
    blks = group_output(boxes, np.array([0]), np.array([0.9]),
                        lines, im_w, im_h, mask)
    assert len(blks) == 1
    assert len(blks[0].lines) == 2
    assert blks[0].language == "eng"
    # eng horizontal lines got expanded by max(int(fs*0.1),2)
    assert blks[0].font_size > 20


def test_group_output_scattered_lines_merge():
    im_w, im_h = 800, 600
    mask = np.zeros((im_h, im_w), dtype=np.uint8)
    lines = [hline(100, 100 + i * 30, 200, 20) for i in range(2)]
    for q in lines:
        mask[q[0, 1]:q[2, 1], q[0, 0]:q[2, 0]] = 229
    # no detection boxes at all → scattered path → merged into one block
    blks = group_output(np.zeros((0, 4), np.int32), np.zeros(0, np.int32),
                        np.zeros(0), lines, im_w, im_h, mask)
    assert len(blks) == 1 and len(blks[0].lines) == 2


def test_group_output_drops_unsupported():
    im_w, im_h = 800, 600
    mask = np.zeros((im_h, im_w), dtype=np.uint8)
    # a line with no block and no mask support → dropped
    lines = [hline(100, 100, 200, 20)]
    blks = group_output(np.zeros((0, 4), np.int32), np.zeros(0, np.int32),
                        np.zeros(0), lines, im_w, im_h, mask)
    assert blks == []
    # an empty box with no mask support → dropped
    boxes = np.array([[400, 400, 500, 450]], dtype=np.int32)
    blks = group_output(boxes, np.array([0]), np.array([0.9]), [],
                        im_w, im_h, mask)
    assert blks == []
    # an empty box WITH mask support → kept with its bbox as the line
    mask[400:450, 400:500] = 229
    blks = group_output(boxes, np.array([0]), np.array([0.9]), [],
                        im_w, im_h, mask)
    assert len(blks) == 1
    assert len(blks[0].lines) == 1


def test_block_struct_roundtrip():
    blk = TextBlock([0, 0, 100, 50], [hline(0, 0, 100, 20)], language="eng")
    examine_textblk(blk, 800, 600)
    d = blk.to_struct(order=3)
    assert d["order"] == 3 and d["language"] == "eng"
    assert len(d["lines"][0]) == 8
    assert isinstance(d["font_size"], float)


def test_block_struct_round_trip():
    import numpy as np

    from ctdray.textblock import TextBlock

    blk = TextBlock([5, 6, 50, 60],
                    lines=[np.array([[5, 6], [50, 6], [50, 20], [5, 20]])],
                    language="ja", vertical=True, font_size=14.0)
    blk.angle = -90
    blk.distance = np.array([12.5, 30.0])
    d = blk.to_struct(order=3)
    back = TextBlock.from_struct(d)
    assert back.xyxy == blk.xyxy
    assert back.language == "ja" and back.vertical and back.font_size == 14.0
    assert back.angle == -90
    np.testing.assert_array_equal(back.distance, blk.distance)
    assert back.to_struct(order=3) == d       # stable round trip


def test_yolo_labels_projection(ray_session):
    import ray.data as rd

    from ctdray.fixtures import make_corpus
    from ctdray.functions.labels import yolo_labels_batch
    from ctdray.pipelines.extract import build_blocks

    blocks = build_blocks(rd.from_arrow(make_corpus(4)))
    labels = blocks.map_batches(yolo_labels_batch,
                                batch_format="pyarrow").to_pandas()
    assert len(labels) > 0
    for lab in labels["label"]:
        parts = lab.split()
        assert parts[0] == "1" and len(parts) == 5
        vals = [float(p) for p in parts[1:]]
        assert all(0.0 <= v <= 1.0 for v in vals)


def test_font_color_sampling_on_known_page():
    """O13: per-line accumulative fg/bg sampling (reference
    set_font_colors/get_font_colors semantics, utils/textblock.py:200-226)."""
    import numpy as np

    from ctdray.textblock import TextBlock, group_output, sample_line_colors

    img = np.full((60, 80), 220, np.uint8)        # light page
    mask = np.zeros((60, 80), np.uint8)
    # two dark glyph lines
    for (y1, y2, x1, x2) in [(10, 18, 10, 60), (25, 33, 10, 60)]:
        img[y1:y2, x1:x2] = 30
        mask[y1:y2, x1:x2] = 255
    line1 = np.array([[10, 10], [60, 10], [60, 18], [10, 18]])
    line2 = np.array([[10, 25], [60, 25], [60, 33], [10, 33]])
    frgb, brgb = sample_line_colors(img, mask, line1)
    assert frgb == (30.0, 30.0, 30.0)
    assert brgb == (220.0, 220.0, 220.0)

    boxes = np.array([[5, 5, 70, 40]])
    blks = group_output(boxes, np.array([0]), np.array([0.9]),
                        [line1, line2], 80, 60, mask, img=img)
    assert len(blks) == 1
    fg, bg = blks[0].font_colors()
    assert fg == [30, 30, 30] and bg == [220, 220, 220]
    # stroke width fires on the raw accumulated difference (reference quirk)
    assert blks[0].stroke_width() == 0.2
    # round trip preserves the accumulated color fields
    d = blks[0].to_struct(order=0)
    assert d["fg_rgb"] == [60, 60, 60] and d["bg_rgb"] == [440, 440, 440]
    back = TextBlock.from_struct(d)
    assert back.to_struct(order=0) == d


def test_group_output_without_img_keeps_zero_colors():
    import numpy as np

    from ctdray.textblock import group_output

    mask = np.zeros((40, 40), np.uint8)
    mask[10:20, 5:35] = 255
    line = np.array([[5, 10], [35, 10], [35, 20], [5, 20]])
    blks = group_output(np.array([[2, 5, 38, 25]]), np.array([0]),
                        np.array([0.9]), [line], 40, 40, mask)
    assert blks[0].fg_rgb == [0, 0, 0] and blks[0].bg_rgb == [0, 0, 0]

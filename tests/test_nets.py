"""ctdray.nets — the pure (no-torch) half of the production network
assembly: DB step function, parse_model channel/stride arithmetic, UNet/DB
shape plans, and the state-dict layout enumerators cross-checked against
prodmodel.fuse_state_dict.  The torch builders themselves are import-gated
and exercised only when torch is present (never in this sandbox)."""
import numpy as np
import pytest

from ctdray import nets
from ctdray.nets import (
    YOLOV5S_CFG, backbone_tap_plan, db_head_param_shapes, db_head_plan,
    db_step_function, detect_strides, make_divisible, plan_yolo_model,
    synthetic_state_dict, unet_head_param_shapes, unet_head_plan,
    yolo_param_shapes,
)
from ctdray.prodmodel import fuse_state_dict

torch_missing = True
try:  # pragma: no cover - torch absent in sandbox
    import torch  # noqa: F401
    torch_missing = False
except ImportError:
    pass


# --- DB step function (basemodel.py:159-160) -------------------------------

def test_db_step_function_formula():
    x = np.array([0.0, 0.5, 0.52, 1.0])
    y = np.array([0.5, 0.5, 0.50, 0.0])
    out = db_step_function(x, y, k=50)
    expected = 1.0 / (1.0 + np.exp(-50 * (x - y)))
    np.testing.assert_allclose(out, expected, rtol=1e-12)
    assert out[1] == pytest.approx(0.5)          # x == y → 0.5
    assert out[2] == pytest.approx(1 / (1 + np.exp(-1.0)))
    assert out[3] > 0.999999                     # far above thresh → ~1


def test_db_step_function_monotone_in_margin():
    thresh = np.full(5, 0.3)
    shrink = np.linspace(0, 1, 5)
    out = db_step_function(shrink, thresh)
    assert np.all(np.diff(out) > 0)


def test_make_divisible():
    # parse_model rounds c2·gw up to a multiple of 8 (yolo.py:230)
    assert make_divisible(64 * 0.5, 8) == 32
    assert make_divisible(1024 * 0.5, 8) == 512
    assert make_divisible(33, 8) == 40


# --- parse_model arithmetic (yolo.py:208-262) ------------------------------

def test_plan_yolo_model_channels_and_savelist():
    plans, save = plan_yolo_model(YOLOV5S_CFG)
    assert len(plans) == 25
    # width 0.5: [64,128,128,256,256,512,512,1024,1024,1024] → halved
    got_c2 = [p.c2 for p in plans[:10]]
    assert got_c2 == [32, 64, 64, 128, 128, 256, 256, 512, 512, 512]
    # depth 0.33: 3→1, 9→3 repeats
    assert [p.args[2] for p in plans if p.module == "C3"][:4] == [1, 3, 3, 1]
    # head Concat output channels
    concat = [p for p in plans if p.module == "Concat"]
    assert [p.c2 for p in concat] == [512, 256, 256, 512]
    # the reference's savelist for this layout
    assert save == [4, 6, 10, 14, 17, 20, 23]


def test_plan_yolo_model_strides_and_taps():
    plans, _ = plan_yolo_model(YOLOV5S_CFG)
    assert [p.stride for p in plans[:10]] == [2, 4, 4, 8, 8, 16, 16, 32, 32, 32]
    # detect inputs: P3/P4/P5 at strides 8/16/32 — the analytic equivalent
    # of the s=256 dry forward (yolo.py:85-91)
    assert detect_strides(plans) == [8, 16, 32]
    det = plans[-1]
    assert det.module == "Detect" and det.args[2] == [128, 256, 512]
    # the five backbone taps (out_indices, basemodel.py:167)
    taps = backbone_tap_plan(640)
    assert taps == {"f160": (64, 160), "f80": (128, 80), "f40": (256, 40),
                    "f20": (512, 20), "f3": (512, 20)}


def test_unet_head_plan_matches_reference_comments():
    # UnetHead.forward comments assume a 640 input (basemodel.py:62-77)
    u = unet_head_plan(640)
    assert u["d10"] == (512, 10)
    assert u["u20"] == (256, 20)
    assert u["u40"] == (256, 40)
    assert u["u80"] == (256, 80)
    assert u["u160"] == (128, 160)
    assert u["u320"] == (64, 320)
    assert u["mask"] == (1, 640)


def test_db_head_plan():
    d = db_head_plan(1024)
    # DB maps come out at FULL input size: binarize/thresh upsample the /4
    # feature ("128@160" at 640, basemodel.py:110) by two 2×2 deconvs —
    # matching the surrogate's (2, S, S) lines_map and the numpy reference
    # forward (npnet.py)
    assert d["lines_map"] == (2, 1024)
    assert d["shrink"] == (1, 1024) and d["thresh"] == (1, 1024)


# --- state-dict enumerators ------------------------------------------------

def test_yolo_param_shapes_known_entries():
    sd = yolo_param_shapes(fused=False)
    # Focus stem: 3·4 space-to-depth channels into a 32-out 3×3 conv
    assert sd["model.0.conv.conv.weight"] == (32, 12, 3, 3)
    assert sd["model.1.conv.weight"] == (64, 32, 3, 3)
    # SPP: cv1 halves 512→256, cv2 takes 4·256
    assert sd["model.8.cv1.conv.weight"] == (256, 512, 1, 1)
    assert sd["model.8.cv2.conv.weight"] == (512, 1024, 1, 1)
    # Detect: (nc=3 + 5) · 3 anchors = 24 outputs per scale
    assert sd["model.24.m.0.weight"] == (24, 128, 1, 1)
    assert sd["model.24.m.2.weight"] == (24, 512, 1, 1)
    assert sd["model.24.anchors"] == (3, 3, 2)
    # no parameters for Concat/Upsample layers
    assert not any(k.startswith(("model.11.", "model.12.")) for k in sd)


def test_fused_yolo_layout_drops_every_bn():
    raw = yolo_param_shapes(fused=False)
    fused = yolo_param_shapes(fused=True)
    assert not any(".bn." in k for k in fused)
    assert sum(1 for k in fused if k.endswith(".conv.bias")) == \
        sum(1 for k in raw if k.endswith(".conv.weight"))


@pytest.mark.parametrize("enum,kwargs", [
    (yolo_param_shapes, {}),
    (unet_head_param_shapes, {}),
    (db_head_param_shapes, {}),
])
def test_fuse_state_dict_maps_unfused_to_fused_layout(enum, kwargs):
    """prodmodel.fuse_state_dict applied to the unfused enumeration must
    produce exactly the fused enumeration — key set AND shapes.  This pins
    the torch builders (whose layout equals the enumerators) to the numpy
    fusion TorchDetector performs."""
    raw = synthetic_state_dict(enum(fused=False, **kwargs))
    fused = fuse_state_dict(raw, default_eps=1e-5)
    expected = enum(fused=True, **kwargs)
    assert set(fused) == set(expected)
    for k, shp in expected.items():
        assert tuple(np.shape(fused[k])) == tuple(shp), k


def test_unet_head_shapes_consistency():
    sd = unet_head_param_shapes(fused=False)
    # down_conv1 C3 over 512ch; deconvs carry (mid, out, 4, 4)
    assert sd["down_conv1.conv.cv1.conv.weight"] == (256, 512, 1, 1)
    assert sd["upconv0.conv.1.weight"] == (512, 256, 4, 4)
    assert sd["upconv2.conv.0.cv1.conv.weight"] == (256, 768, 1, 1)
    assert sd["upconv6.0.weight"] == (64, 1, 4, 4)
    # the standalone deconv+BN pairs survive fusion untouched
    fused = unet_head_param_shapes(fused=True)
    assert "upconv0.conv.2.running_mean" in fused


def test_db_head_shapes_consistency():
    sd = db_head_param_shapes(fused=False)
    assert sd["conv.0.weight"] == (64, 128, 1, 1)
    assert sd["binarize.0.weight"] == (16, 64, 3, 3)
    assert sd["binarize.6.weight"] == (16, 1, 2, 2)
    # thresh's first conv is bias-free (_init_thresh bias=False,
    # basemodel.py:130-143)
    assert "thresh.0.bias" not in sd
    assert sd["thresh.6.bias"] == (1,)
    # plain-Sequential BNs are NOT fused away
    fused = db_head_param_shapes(fused=True)
    assert "conv.1.running_var" in fused and "binarize.4.weight" in fused


# --- torch gating ----------------------------------------------------------

@pytest.mark.skipif(not torch_missing, reason="torch present")
def test_builders_raise_not_implemented_without_torch():
    with pytest.raises(NotImplementedError):
        nets.build_yolov5()
    with pytest.raises(NotImplementedError):
        nets.build_unet_head()
    with pytest.raises(NotImplementedError):
        nets.default_network_factory({})


@pytest.mark.skipif(torch_missing, reason="needs torch")
def test_torch_builders_match_enumerators():  # pragma: no cover - no torch
    for build, enum in [
        (lambda: nets.build_yolov5(fused=False), yolo_param_shapes),
        (lambda: nets.build_unet_head(fused=False), unet_head_param_shapes),
        (lambda: nets.build_db_head(fused=False), db_head_param_shapes),
    ]:
        mod = build()
        got = {k: tuple(v.shape) for k, v in mod.state_dict().items()}
        assert got == enum(fused=False)


@pytest.mark.skipif(torch_missing, reason="needs torch")
def test_torch_forward_shapes():  # pragma: no cover - no torch
    sd = {
        "blk_det": synthetic_state_dict(yolo_param_shapes(fused=True)),
        "text_seg": synthetic_state_dict(unet_head_param_shapes(fused=True)),
        "text_det": synthetic_state_dict(db_head_param_shapes(fused=True)),
    }
    net = nets.default_network_factory(sd)
    blob = np.zeros((1, 3, 256, 256), dtype=np.float32)
    blks, mask, lines = net(blob)
    assert blks.shape[0] == 1 and blks.shape[2] == 8
    assert mask.shape == (1, 1, 256, 256)
    assert lines.shape == (1, 2, 128, 128)


# --- numpy reference forward (npnet.py): runs the plan graph in-sandbox ----

def test_np_forward_shapes_match_plans():
    """Execute the FULL plan graph in numpy over synthetic weights at a
    64-px input: every layer's channel count is asserted against
    plan_yolo_model inside np_yolo_forward, the five taps must match
    backbone_tap_plan, the detect row count the analytic strides, and the
    head outputs the (corrected) head plans — the torch-gated builders'
    architecture, executed end-to-end without torch."""
    from ctdray.nets import (backbone_tap_plan, db_head_param_shapes,
                             detect_strides, synthetic_state_dict,
                             unet_head_param_shapes, yolo_param_shapes)
    from ctdray.npnet import (np_db_head_forward, np_unet_head_forward,
                              np_yolo_forward)

    S = 64
    blob = np.random.default_rng(0).random((1, 3, S, S))
    sd = synthetic_state_dict(yolo_param_shapes(), seed=1)
    rows, taps = np_yolo_forward(sd, blob, fused=False)
    for (name, (c, sp)), t in zip(backbone_tap_plan(S).items(), taps):
        assert t.shape == (1, c, sp, sp), name
    plans, _ = plan_yolo_model(YOLOV5S_CFG)
    na = len(YOLOV5S_CFG["anchors"][0]) // 2
    exp_rows = sum(na * (S // s) ** 2 for s in detect_strides(plans))
    assert rows.shape == (1, exp_rows, YOLOV5S_CFG["nc"] + 5)

    seg_sd = synthetic_state_dict(unet_head_param_shapes(), seed=2)
    mask, det_feats = np_unet_head_forward(seg_sd, *taps)
    assert mask.shape == (1, 1, S, S)
    assert np.all((mask >= 0) & (mask <= 1))

    det_sd = synthetic_state_dict(db_head_param_shapes(), seed=3)
    lines = np_db_head_forward(det_sd, *det_feats)
    assert lines.shape == (1, 2, S, S)        # FULL size (db_head_plan)
    assert np.all((lines >= 0) & (lines <= 1))


def test_np_forward_fused_equals_unfused():
    """The strongest in-sandbox cross-check: the triple forward with
    UNFUSED conv+BN weights must numerically equal the same forward with
    prodmodel.fuse_state_dict-fused weights (backbone eps 1e-3, head BNs
    1e-5, exactly TorchDetector's recipe).  A transposed concat index, a
    wrong enumerated shape or a bad fuse eps all surface here."""
    from ctdray.nets import (db_head_param_shapes, synthetic_state_dict,
                             unet_head_param_shapes, yolo_param_shapes)
    from ctdray.npnet import np_textdet_forward

    S = 64
    blob = np.random.default_rng(7).random((1, 3, S, S))
    blk = synthetic_state_dict(yolo_param_shapes(), seed=11)
    seg = synthetic_state_dict(unet_head_param_shapes(), seed=12)
    det = synthetic_state_dict(db_head_param_shapes(), seed=13)

    out_raw = np_textdet_forward(blk, seg, det, blob, fused=False)
    out_fused = np_textdet_forward(
        fuse_state_dict(blk, default_eps=1e-3),
        fuse_state_dict(seg, default_eps=1e-5),
        fuse_state_dict(det, default_eps=1e-5),
        blob, fused=True)
    for raw, fz, name in zip(out_raw, out_fused, ("blks", "mask", "lines")):
        assert raw.shape == fz.shape, name
        assert np.allclose(raw, fz, atol=1e-4, rtol=1e-4), name


def test_np_forward_deterministic():
    from ctdray.nets import synthetic_state_dict, yolo_param_shapes
    from ctdray.npnet import np_yolo_forward

    blob = np.random.default_rng(1).random((1, 3, 64, 64))
    sd = synthetic_state_dict(yolo_param_shapes(), seed=5)
    r1, _ = np_yolo_forward(sd, blob)
    r2, _ = np_yolo_forward(sd, blob)
    assert np.array_equal(r1, r2)

"""Prod checkpoint plumbing — pure-numpy parts, no torch needed
(reference: utils/yolov5_utils.py:23-43, basemodel.py:211-220,
inference.py:151-155)."""
import numpy as np
import pytest

from ctdray.prodmodel import (fix_reversed_outputs, fuse_conv_bn_arrays,
                              fuse_state_dict, preprocess_blob,
                              split_checkpoint)


def _conv2d(x, w, b):
    """Naive valid-padding conv via im2col (n=1)."""
    _, cin, kh, kw = w.shape
    h, wdt = x.shape[1], x.shape[2]
    oh, ow = h - kh + 1, wdt - kw + 1
    cols = np.zeros((cin * kh * kw, oh * ow))
    i = 0
    for y in range(oh):
        for xx in range(ow):
            cols[:, i] = x[:, y:y + kh, xx:xx + kw].reshape(-1)
            i += 1
    out = w.reshape(w.shape[0], -1) @ cols + b[:, None]
    return out.reshape(w.shape[0], oh, ow)


def test_fuse_conv_bn_matches_sequential_conv_then_bn():
    rng = np.random.default_rng(21)
    cin, cout, k = 3, 5, 3
    w = rng.standard_normal((cout, cin, k, k))
    b = rng.standard_normal(cout)
    gamma = rng.uniform(0.5, 2.0, cout)
    beta = rng.standard_normal(cout)
    mean = rng.standard_normal(cout)
    var = rng.uniform(0.1, 2.0, cout)
    eps = 1e-3
    x = rng.standard_normal((cin, 8, 8))

    y = _conv2d(x, w, b)
    y_bn = gamma[:, None, None] * (y - mean[:, None, None]) \
        / np.sqrt(var + eps)[:, None, None] + beta[:, None, None]

    wf, bf = fuse_conv_bn_arrays(w, b, gamma, beta, mean, var, eps)
    y_fused = _conv2d(x, wf, bf)
    np.testing.assert_allclose(y_fused, y_bn, rtol=1e-10, atol=1e-10)


def test_fuse_conv_bn_no_bias():
    rng = np.random.default_rng(22)
    w = rng.standard_normal((4, 2, 1, 1))
    gamma, beta = rng.uniform(0.5, 2, 4), rng.standard_normal(4)
    mean, var = rng.standard_normal(4), rng.uniform(0.1, 1, 4)
    wf, bf = fuse_conv_bn_arrays(w, None, gamma, beta, mean, var, 1e-5)
    scale = gamma / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(bf, scale * (0 - mean) + beta)
    np.testing.assert_allclose(wf, scale[:, None, None, None] * w)


def test_fuse_state_dict_walk():
    rng = np.random.default_rng(23)
    sd = {
        "m.0.conv.weight": rng.standard_normal((4, 3, 3, 3)),
        "m.0.bn.weight": rng.uniform(0.5, 2, 4),
        "m.0.bn.bias": rng.standard_normal(4),
        "m.0.bn.running_mean": rng.standard_normal(4),
        "m.0.bn.running_var": rng.uniform(0.1, 1, 4),
        "m.0.bn.num_batches_tracked": np.array(100),
        "head.weight": rng.standard_normal((2, 4)),       # untouched
    }
    fused = fuse_state_dict(sd)
    assert "m.0.conv.bias" in fused
    assert not any(k.startswith("m.0.bn.") for k in fused)
    assert np.array_equal(fused["head.weight"], sd["head.weight"])
    # arithmetic matches the array-level fuse (YOLOv5 default eps 1e-3)
    wf, bf = fuse_conv_bn_arrays(
        sd["m.0.conv.weight"], None, sd["m.0.bn.weight"], sd["m.0.bn.bias"],
        sd["m.0.bn.running_mean"], sd["m.0.bn.running_var"], eps=1e-3)
    np.testing.assert_allclose(fused["m.0.conv.weight"], wf)
    np.testing.assert_allclose(fused["m.0.conv.bias"], bf)


def test_split_checkpoint_validates_keys():
    ok = {"blk_det": 1, "text_seg": 2, "text_det": 3}
    assert split_checkpoint(ok) == (1, 2, 3)
    with pytest.raises(KeyError, match="text_det"):
        split_checkpoint({"blk_det": 1, "text_seg": 2})


def test_fix_reversed_outputs_quirk():
    blks = np.zeros((1, 10, 8), np.float32)
    mask = np.zeros((1, 1, 64, 64), np.float32)
    lines = np.zeros((1, 2, 64, 64), np.float32)
    # correct order untouched
    b, m, l = fix_reversed_outputs(blks, mask, lines)
    assert m.shape[1] == 1 and l.shape[1] == 2
    # reversed order (inference.py:151-155) swapped back
    b, m, l = fix_reversed_outputs(blks, lines, mask)
    assert m.shape[1] == 1 and l.shape[1] == 2


def test_preprocess_blob_shape_and_range():
    img = np.full((100, 200), 128, np.uint8)
    blob, dw, dh = preprocess_blob(img, 256)
    assert blob.shape == (1, 3, 256, 256) and blob.dtype == np.float32
    assert 0.0 <= blob.min() and blob.max() <= 1.0
    # bottom/right letterbox: padded area is zero
    assert blob[0, :, 200:, :].max() == 0.0

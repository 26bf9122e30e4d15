"""Pure-numpy reference forward of the planned networks (nets.py).

The torch builders below ``nets._nets()`` cannot run in-sandbox (torch
absent), so this module executes the SAME plan graph — ``plan_yolo_model``
rows for the yolov5 backbone, the UnetHead/DBHead module layout of the
state-dict enumerators — in numpy, over ``synthetic_state_dict`` weights.
It exists to de-risk the torch-gated assembly end-to-end:

  * every layer's output shape is checked against the analytic plan
    (channel arithmetic + stride tracking) by test_nets.py;
  * running the same graph with UNFUSED (conv+BN) and FUSED
    (prodmodel.fuse_state_dict) weights must agree numerically, which
    cross-validates the plan graph, the enumerated state-dict layout and
    the fuse math against each other — a transposed index in the concat
    arithmetic or a wrong BN eps shows up as a numeric mismatch here
    instead of only in prod.

Semantics mirror the reference modules exactly (common.py Conv/C3/SPP/
SPPF/Focus, yolo.py Detect inference path, basemodel.py:20-160 heads);
performance is irrelevant — this is a correctness harness, not an engine
backend (the engine's sandbox backend is SurrogateDetector).
"""
from __future__ import annotations

import numpy as np

from .nets import (OUT_INDICES, YOLOV5S_CFG, autopad, detect_strides,
                   plan_yolo_model)

# --- kernels ---------------------------------------------------------------


def conv2d(x: np.ndarray, w: np.ndarray, b=None, stride: int = 1,
           pad: int = 0) -> np.ndarray:
    """(N,C,H,W) ⊛ (Cout,Cin,kh,kw), groups=1 (the only case this model
    uses)."""
    if pad:
        x = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    kh, kw = w.shape[2:]
    win = np.lib.stride_tricks.sliding_window_view(x, (kh, kw), axis=(2, 3))
    win = win[:, :, ::stride, ::stride]
    out = np.einsum("nchwij,ocij->nohw", win, w, optimize=True)
    if b is not None:
        out = out + b[None, :, None, None]
    return out


def conv_transpose2d(x: np.ndarray, w: np.ndarray, b=None, stride: int = 2,
                     pad: int = 0) -> np.ndarray:
    """(N,Cin,H,W) deconv with (Cin,Cout,kh,kw) — the two shapes the heads
    use (4/2/1 and 2/2/0)."""
    n, c, h, ww = x.shape
    _, cout, kh, kw = w.shape
    y = np.einsum("nchw,coij->nohwij", x, w, optimize=True)
    out = np.zeros((n, cout, (h - 1) * stride + kh, (ww - 1) * stride + kw))
    for i in range(kh):
        for j in range(kw):
            out[:, :, i:i + h * stride:stride,
                j:j + ww * stride:stride] += y[..., i, j]
    if pad:
        out = out[:, :, pad:-pad, pad:-pad]
    if b is not None:
        out = out + b[None, :, None, None]
    return out


def batchnorm(x, sd, prefix, eps):
    g = sd[f"{prefix}.weight"]
    b = sd[f"{prefix}.bias"]
    m = sd[f"{prefix}.running_mean"]
    v = sd[f"{prefix}.running_var"]
    scale = (g / np.sqrt(v + eps))[None, :, None, None]
    return x * scale + (b - m * g / np.sqrt(v + eps))[None, :, None, None]


def activation(x, act):
    if act == "leaky":
        return np.where(x > 0, x, 0.1 * x)
    if act == "relu":
        return np.maximum(x, 0)
    if act is True or act == "silu":
        return x / (1.0 + np.exp(-x))
    return x


def maxpool_same(x, k):
    p = k // 2
    xp = np.pad(x, ((0, 0), (0, 0), (p, p), (p, p)),
                constant_values=-np.inf)
    win = np.lib.stride_tricks.sliding_window_view(xp, (k, k), axis=(2, 3))
    return win.max(axis=(-2, -1))


def avgpool2(x):
    n, c, h, w = x.shape
    return x[:, :, :h - h % 2, :w - w % 2] \
        .reshape(n, c, h // 2, 2, w // 2, 2).mean(axis=(3, 5))


def upsample_nearest2(x):
    return np.repeat(np.repeat(x, 2, axis=2), 2, axis=3)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


# --- module forwards over a state-dict prefix ------------------------------

_BB_EPS = 1e-3      # yolov5 backbone BN eps (initialize_weights)
_HEAD_EPS = 1e-5    # UnetHead/DBHead bare BNs keep the torch default


def conv_block(sd, prefix, x, stride=1, act="leaky", fused=False,
               eps=_BB_EPS):
    """common.py Conv: conv(+BN unless fused) + act; k from weight shape."""
    w = sd[f"{prefix}.conv.weight"]
    k = w.shape[2]
    y = conv2d(x, w, sd.get(f"{prefix}.conv.bias"), stride=stride,
               pad=autopad(k))
    if not fused:
        y = batchnorm(y, sd, f"{prefix}.bn", eps)
    return activation(y, act)


def c3_block(sd, prefix, x, n=1, shortcut=True, act="leaky", fused=False,
             eps=_BB_EPS):
    a = conv_block(sd, f"{prefix}.cv1", x, act=act, fused=fused, eps=eps)
    for j in range(n):
        y = conv_block(sd, f"{prefix}.m.{j}.cv1", a, act=act, fused=fused,
                       eps=eps)
        y = conv_block(sd, f"{prefix}.m.{j}.cv2", y, act=act, fused=fused,
                       eps=eps)
        a = a + y if shortcut else y        # e=1.0 inside C3: c1 == c2
    b = conv_block(sd, f"{prefix}.cv2", x, act=act, fused=fused, eps=eps)
    return conv_block(sd, f"{prefix}.cv3", np.concatenate([a, b], axis=1),
                      act=act, fused=fused, eps=eps)


def spp_block(sd, prefix, x, ks=(5, 9, 13), act="leaky", fused=False,
              eps=_BB_EPS):
    x = conv_block(sd, f"{prefix}.cv1", x, act=act, fused=fused, eps=eps)
    cat = np.concatenate([x] + [maxpool_same(x, k) for k in ks], axis=1)
    return conv_block(sd, f"{prefix}.cv2", cat, act=act, fused=fused,
                      eps=eps)


def sppf_block(sd, prefix, x, k=5, act="leaky", fused=False, eps=_BB_EPS):
    x = conv_block(sd, f"{prefix}.cv1", x, act=act, fused=fused, eps=eps)
    y1 = maxpool_same(x, k)
    y2 = maxpool_same(y1, k)
    y3 = maxpool_same(y2, k)
    return conv_block(sd, f"{prefix}.cv2",
                      np.concatenate([x, y1, y2, y3], axis=1),
                      act=act, fused=fused, eps=eps)


def focus_block(sd, prefix, x, stride=1, act="leaky", fused=False,
                eps=_BB_EPS):
    cat = np.concatenate(
        [x[..., ::2, ::2], x[..., 1::2, ::2],
         x[..., ::2, 1::2], x[..., 1::2, 1::2]], axis=1)
    return conv_block(sd, f"{prefix}.conv", cat, stride=stride, act=act,
                      fused=fused, eps=eps)


def detect_forward(sd, prefix, xs, nc, anchors, strides):
    """yolo.py Detect inference: per-scale 1×1 conv → sigmoid → grid
    decode → (1, N, nc+5) rows.  ``anchors`` buffer comes stride-normalized
    from the state dict (nets.YoloModel docstring)."""
    na = len(anchors[0]) // 2
    no = nc + 5
    anc = np.asarray(sd[f"{prefix}.anchors"], dtype=np.float64)
    rows = []
    for i, x in enumerate(xs):
        y = conv2d(x, sd[f"{prefix}.m.{i}.weight"],
                   sd[f"{prefix}.m.{i}.bias"])
        bs, _, ny, nx = y.shape
        y = y.reshape(bs, na, no, ny, nx).transpose(0, 1, 3, 4, 2)
        y = _sigmoid(y)
        yv, xv = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
        grid = np.stack((xv, yv), axis=2)[None, None]
        ag = (anc[i] * strides[i]).reshape(1, na, 1, 1, 2)
        xy = (y[..., 0:2] * 2 - 0.5 + grid) * strides[i]
        wh = (y[..., 2:4] * 2) ** 2 * ag
        rows.append(np.concatenate((xy, wh, y[..., 4:]), axis=-1)
                    .reshape(bs, -1, no))
    return np.concatenate(rows, axis=1)


def np_yolo_forward(sd, x, cfg=None, fused=False, act="leaky",
                    out_indices=OUT_INDICES, detect=True):
    """Execute the plan graph (plan_yolo_model) in numpy: returns
    ``(detect_rows, taps)`` like nets.YoloModel.forward(detect=True),
    plus the per-layer output list for shape auditing."""
    cfg = cfg or YOLOV5S_CFG
    plans, save = plan_yolo_model(cfg)
    strides = detect_strides(plans)
    saveset = set(save)
    y: list = []
    taps = []
    det_rows = None
    for p in plans:
        pre = f"model.{p.i}"
        xin = x if p.f == -1 else (
            y[p.f] if isinstance(p.f, int)
            else [x if j == -1 else y[j] for j in p.f])
        s = p.args[3] if p.module in ("Conv",) and len(p.args) > 3 else 1
        if p.module == "Conv":
            x = conv_block(sd, pre, xin, stride=s, act=act, fused=fused)
        elif p.module == "Focus":
            x = focus_block(sd, pre, xin, act=act, fused=fused)
        elif p.module == "C3":
            x = c3_block(sd, pre, xin, n=p.args[2], act=act, fused=fused)
        elif p.module == "SPP":
            x = spp_block(sd, pre, xin, ks=tuple(p.args[2]), act=act,
                          fused=fused)
        elif p.module == "SPPF":
            x = sppf_block(sd, pre, xin, k=p.args[2] if len(p.args) > 2
                           else 5, act=act, fused=fused)
        elif p.module == "Concat":
            x = np.concatenate(xin, axis=1)
        elif p.module == "nn.Upsample":
            x = upsample_nearest2(xin)
        elif p.module == "Detect":
            det_rows = detect_forward(sd, pre, xin, cfg["nc"],
                                      cfg["anchors"], strides)
            x = det_rows
        else:
            raise NotImplementedError(f"numpy forward: {p.module}")
        if p.module != "Detect":
            assert x.shape[1] == p.c2, \
                f"layer {p.i} ({p.module}): got C={x.shape[1]}, plan {p.c2}"
        y.append(x if p.i in saveset else None)
        if p.i in out_indices:
            taps.append(x)
    if detect:
        return det_rows, taps
    return taps


def dcu_block(sd, prefix, x, act="leaky", fused=False):
    """double_conv_up_c3 (basemodel.py:20-31): C3 + deconv(4,2,1) + BN +
    ReLU — the deconv+bare-BN pair survives fusion untouched."""
    x = c3_block(sd, f"{prefix}.conv.0", x, act=act, fused=fused,
                 eps=_HEAD_EPS)
    x = conv_transpose2d(x, sd[f"{prefix}.conv.1.weight"], stride=2, pad=1)
    x = batchnorm(x, sd, f"{prefix}.conv.2", _HEAD_EPS)
    return np.maximum(x, 0)


def np_unet_head_forward(sd, f160, f80, f40, f20, f3, mode="inference",
                         act="leaky", fused=False):
    """UnetHead.forward (basemodel.py:62-77) in numpy."""
    cat = lambda *xs: np.concatenate(xs, axis=1)
    d10 = c3_block(sd, "down_conv1.conv", avgpool2(f3), act=act,
                   fused=fused, eps=_HEAD_EPS)
    u20 = dcu_block(sd, "upconv0", d10, act=act, fused=fused)
    u40 = dcu_block(sd, "upconv2", cat(f20, u20), act=act, fused=fused)
    if mode == "det":
        return f80, f40, u40
    u80 = dcu_block(sd, "upconv3", cat(f40, u40), act=act, fused=fused)
    u160 = dcu_block(sd, "upconv4", cat(f80, u80), act=act, fused=fused)
    u320 = dcu_block(sd, "upconv5", cat(f160, u160), act=act, fused=fused)
    mask = _sigmoid(conv_transpose2d(u320, sd["upconv6.0.weight"],
                                     stride=2, pad=1))
    if mode == "mask":
        return mask
    return mask, (f80, f40, u40)


def np_db_head_forward(sd, f80, f40, u40, act="leaky", fused=False):
    """DBHead.forward inference path (basemodel.py:106-125):
    cat(shrink, thresh) — the lines_map contract."""
    cat = lambda *xs: np.concatenate(xs, axis=1)
    u80 = dcu_block(sd, "upconv3", cat(f40, u40), act=act, fused=fused)
    x = dcu_block(sd, "upconv4", cat(f80, u80), act=act, fused=fused)
    x = conv2d(x, sd["conv.0.weight"], sd["conv.0.bias"])
    x = np.maximum(batchnorm(x, sd, "conv.1", _HEAD_EPS), 0)

    def tower(pfx, first_bias):
        t = conv2d(x, sd[f"{pfx}.0.weight"],
                   sd.get(f"{pfx}.0.bias") if first_bias else None, pad=1)
        t = np.maximum(batchnorm(t, sd, f"{pfx}.1", _HEAD_EPS), 0)
        t = conv_transpose2d(t, sd[f"{pfx}.3.weight"], sd[f"{pfx}.3.bias"],
                             stride=2, pad=0)
        t = np.maximum(batchnorm(t, sd, f"{pfx}.4", _HEAD_EPS), 0)
        return conv_transpose2d(t, sd[f"{pfx}.6.weight"],
                                sd[f"{pfx}.6.bias"], stride=2, pad=0)

    shrink = _sigmoid(tower("binarize", True))
    thresh = _sigmoid(tower("thresh", False))
    return np.concatenate((shrink, thresh), axis=1)


def np_textdet_forward(blk_sd, seg_sd, det_sd, blob, cfg=None,
                       act="leaky", fused=False):
    """The fused triple forward (TextDetBase.forward, basemodel.py:240-244)
    in numpy: blob (1,3,S,S) → (blks, mask, lines_map)."""
    blks, taps = np_yolo_forward(blk_sd, blob, cfg=cfg, fused=fused,
                                 act=act)
    mask, det_feats = np_unet_head_forward(seg_sd, *taps, mode="inference",
                                           act=act, fused=fused)
    lines = np_db_head_forward(det_sd, *det_feats, act=act, fused=fused)
    return blks, mask, lines

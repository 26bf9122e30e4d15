"""Production network assembly — the reference's model definitions,
re-expressed so ``TorchDetector(model_path)`` runs real weights end-to-end
with no user-supplied ``network_factory``.

The reference builds three nets from one fused checkpoint
(``get_base_det_models``, basemodel.py:211-220):

* a YOLOv5 backbone+head rebuilt from the cfg dict embedded in the
  checkpoint (``Model(ckpt['cfg'])``, models/yolov5/yolo.py:286-311,
  parse_model yolo.py:208-262),
* a ``UnetHead`` text-segmentation decoder (basemodel.py:47-80),
* a ``DBHead`` shrink/threshold detector (basemodel.py:83-161),

then Conv+BN-fuses everything (``TextDetBase.fuse``, basemodel.py:228-238;
``Model.fuse``, yolo.py:186-192) and runs the fused triple forward
(``TextDetBase.forward``, basemodel.py:240-244).

Layout of this module:

* **Pure python/numpy, importable in any environment** (tested in-sandbox,
  no torch): the DB step function, the parse_model channel/stride
  arithmetic (:func:`plan_yolo_model`), the UnetHead/DBHead shape plans,
  and full state-dict *key → shape* enumerators for all three nets in both
  unfused and fused form.  The enumerators are the contract the torch
  builders are checked against, and they cross-validate
  ``prodmodel.fuse_state_dict`` (fusing the unfused enumeration must yield
  exactly the fused enumeration).
* **Torch-gated builders** (:func:`build_yolov5`, :func:`build_unet_head`,
  :func:`build_db_head`, :func:`default_network_factory`): import torch
  lazily, instantiate modules whose state-dict layout equals the
  enumerators', and load the numpy state dicts produced by
  ``ctdray.prodmodel``.

Everything here derives from the reference's public in-repo code and the
public Ultralytics YOLOv5 architecture; no torch import happens at module
import time.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

# ---------------------------------------------------------------------------
# Pure helpers (sandbox-testable)
# ---------------------------------------------------------------------------


def autopad(k, p=None):
    """'same' padding (models/yolov5/common.py:24-28)."""
    if p is None:
        p = k // 2 if isinstance(k, int) else [x // 2 for x in k]
    return p


def make_divisible(x, divisor):
    """Nearest multiple ≥ x·gw rounding (utils/yolov5_utils.py:64-67)."""
    return math.ceil(x / divisor) * divisor


def db_step_function(shrink: np.ndarray, thresh: np.ndarray,
                     k: float = 50.0) -> np.ndarray:
    """DBNet differentiable binarization step — ``1/(1+exp(-k·(x−y)))``
    (DBHead.step_function, basemodel.py:159-160; k=50 basemodel.py:84)."""
    shrink = np.asarray(shrink, dtype=np.float64)
    thresh = np.asarray(thresh, dtype=np.float64)
    return 1.0 / (1.0 + np.exp(-k * (shrink - thresh)))


# The public Ultralytics yolov5s layout of the reference's vintage (Focus
# stem + SPP, models/yolov5/common.py ships Focus/SPP), with the
# reference's 3 text classes (inference.py:117-118).  The real cfg ships
# inside the checkpoint (yolo.py:292); this constant exists for tests and
# as a documented default.
YOLOV5S_CFG = {
    "nc": 3,
    "depth_multiple": 0.33,
    "width_multiple": 0.50,
    "anchors": [
        [10, 13, 16, 30, 33, 23],
        [30, 61, 62, 45, 59, 119],
        [116, 90, 156, 198, 373, 326],
    ],
    "backbone": [
        [-1, 1, "Focus", [64, 3]],          # 0  P1/2
        [-1, 1, "Conv", [128, 3, 2]],       # 1  P2/4   (f160 tap)
        [-1, 3, "C3", [128]],               # 2
        [-1, 1, "Conv", [256, 3, 2]],       # 3  P3/8   (f80 tap)
        [-1, 9, "C3", [256]],               # 4
        [-1, 1, "Conv", [512, 3, 2]],       # 5  P4/16  (f40 tap)
        [-1, 9, "C3", [512]],               # 6
        [-1, 1, "Conv", [1024, 3, 2]],      # 7  P5/32  (f20 tap)
        [-1, 1, "SPP", [1024, [5, 9, 13]]], # 8
        [-1, 3, "C3", [1024, False]],       # 9         (f3 tap)
    ],
    "head": [
        [-1, 1, "Conv", [512, 1, 1]],                 # 10
        [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
        [[-1, 6], 1, "Concat", [1]],
        [-1, 3, "C3", [512, False]],                  # 13
        [-1, 1, "Conv", [256, 1, 1]],                 # 14
        [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
        [[-1, 4], 1, "Concat", [1]],
        [-1, 3, "C3", [256, False]],                  # 17 P3
        [-1, 1, "Conv", [256, 3, 2]],                 # 18
        [[-1, 14], 1, "Concat", [1]],
        [-1, 3, "C3", [512, False]],                  # 20 P4
        [-1, 1, "Conv", [512, 3, 2]],                 # 21
        [[-1, 10], 1, "Concat", [1]],
        [-1, 3, "C3", [1024, False]],                 # 23 P5
        [[17, 20, 23], 1, "Detect", ["nc", "anchors"]],
    ],
}

OUT_INDICES = (1, 3, 5, 7, 9)   # backbone taps (basemodel.py:167)

# Modules with no learnable channel transform: output channels = input's.
_PASSTHROUGH = {"nn.Upsample", "nn.MaxPool2d", "nn.AvgPool2d", "nn.ZeroPad2d"}
# Conv-family modules parse_model rewrites args for (yolo.py:228-236).
_CONV_FAMILY = {"Conv", "GhostConv", "Bottleneck", "GhostBottleneck", "SPP",
                "SPPF", "DWConv", "Focus", "BottleneckCSP", "C3", "C3TR",
                "C3SPP", "C3Ghost"}
_REPEAT_FAMILY = {"BottleneckCSP", "C3", "C3TR", "C3Ghost"}
_STRIDE2 = {"Focus"}            # Focus is a space-to-depth /2


@dataclass
class LayerPlan:
    """One resolved row of the model cfg — parse_model's per-layer output
    (yolo.py:208-262) plus the cumulative stride this module sees."""
    i: int                      # layer index
    f: int | list               # 'from' layer(s)
    n: int                      # resolved repeat count (after depth gain)
    module: str                 # module name string, e.g. "C3"
    args: list = field(default_factory=list)   # resolved ctor args
    c1: int | list = 0          # input channels (list for Concat/Detect)
    c2: int = 0                 # output channels
    stride: int = 1             # cumulative downsample factor of the OUTPUT


def _eval_arg(a, names):
    """parse_model evals string args against local names (yolo.py:218-223);
    restricted re-expression: name table + literal parse, else verbatim."""
    if not isinstance(a, str):
        return a
    if a in names:
        return names[a]
    try:
        import ast
        return ast.literal_eval(a)
    except (ValueError, SyntaxError):
        return a


def plan_yolo_model(cfg: dict) -> tuple[list[LayerPlan], list[int]]:
    """Pure re-expression of parse_model's channel arithmetic
    (models/yolov5/yolo.py:208-262) plus analytic stride tracking (the
    reference derives strides from a dry forward at s=256, yolo.py:85-91;
    with known module strides they are computable without one).

    Returns ``(plans, savelist)``; ``plans[-1]`` is the Detect row whose
    ``c1`` is the per-scale input channel list and whose ``stride`` field
    is unused (per-scale strides live on the input plans)."""
    anchors, nc = cfg["anchors"], cfg["nc"]
    gd, gw = cfg["depth_multiple"], cfg["width_multiple"]
    na = len(anchors[0]) // 2 if isinstance(anchors, list) else anchors
    no = na * (nc + 5)
    names = {"nc": nc, "anchors": anchors, "None": None, "nearest": "nearest",
             "True": True, "False": False}

    plans: list[LayerPlan] = []
    save: list[int] = []
    ch = [cfg.get("ch", 3)]
    strides = [1]
    for i, (f, n, m, args) in enumerate(cfg["backbone"] + cfg["head"]):
        m = m if isinstance(m, str) else getattr(m, "__name__", str(m))
        args = [_eval_arg(a, names) for a in args]
        n = max(round(n * gd), 1) if n > 1 else n
        c1 = ch[f] if isinstance(f, int) else [ch[x] for x in f]
        s_in = strides[f] if isinstance(f, int) else max(strides[x] for x in f)

        if m in _CONV_FAMILY:
            c2 = args[0]
            if c2 != no:
                c2 = make_divisible(c2 * gw, 8)
            args = [c1, c2, *args[1:]]
            if m in _REPEAT_FAMILY:
                args.insert(2, n)
                n = 1
            # spatial stride: Conv-family arg layout is (c1, c2, k, s, ...)
            s_mod = 2 if m in _STRIDE2 else (
                args[3] if m in ("Conv", "DWConv", "GhostConv")
                and len(args) > 3 and isinstance(args[3], int) else 1)
        elif m == "nn.BatchNorm2d":
            c2, args, s_mod = c1, [c1], 1
        elif m == "Concat":
            c2, s_mod = sum(c1), 1
        elif m == "Detect":
            args = [args[0], args[1], list(c1)]
            c2, s_mod = no, 1
        elif m == "Contract":
            c2, s_mod = c1 * args[0] ** 2, args[0]
        elif m == "Expand":
            c2, s_mod = c1 // args[0] ** 2, 1
        elif m == "nn.Upsample":
            c2, s_mod = c1, 1
            s_in = s_in / args[1] if len(args) > 1 else s_in
            s_mod = 1
        else:
            c2, s_mod = c1, 1

        s_out = int(s_in * s_mod) if s_in >= 1 else s_in * s_mod
        plans.append(LayerPlan(i=i, f=f, n=n, module=m, args=args,
                               c1=c1, c2=c2, stride=s_out))
        save.extend(x % i for x in ([f] if isinstance(f, int) else f)
                    if x != -1)
        if i == 0:
            ch = []
        ch.append(c2)
        if i == 0:
            strides = []
        strides.append(s_out)
    return plans, sorted(set(save))


def detect_strides(plans: list[LayerPlan]) -> list[int]:
    """Per-scale strides of the Detect layer's inputs — the analytic
    equivalent of the s=256 dry forward (yolo.py:85-91)."""
    det = plans[-1]
    if det.module != "Detect":
        raise ValueError("last layer is not Detect")
    return [int(plans[j].stride) for j in det.f]


# --- UnetHead / DBHead shape plans (basemodel.py:47-124) -------------------

def backbone_tap_plan(input_size: int = 1024) -> dict[str, tuple[int, int]]:
    """(channels, spatial) of the five backbone taps fed to UnetHead
    (out_indices [1,3,5,7,9], basemodel.py:163-168), for a square input."""
    plans, _ = plan_yolo_model(YOLOV5S_CFG)
    names = ["f160", "f80", "f40", "f20", "f3"]
    out = {}
    for name, idx in zip(names, OUT_INDICES):
        p = plans[idx]
        out[name] = (p.c2, input_size // p.stride)
    return out


def unet_head_plan(input_size: int = 1024) -> dict[str, tuple[int, int]]:
    """(channels, spatial) of every UnetHead intermediate
    (UnetHead.forward, basemodel.py:62-77; names follow its comments,
    which assume a 640 input — sizes here scale with ``input_size``)."""
    taps = backbone_tap_plan(input_size)
    s32 = taps["f3"][1]
    return {
        **taps,
        "d10": (512, s32 // 2),    # down_conv1: stride-2 C3 on f3
        "u20": (256, s32),         # upconv0: C3(512→512) + deconv ×2
        "u40": (256, s32 * 2),     # upconv2: cat(f20,u20)=768 → 256, ×2
        "u80": (256, s32 * 4),     # upconv3: cat(f40,u40)=768 → 256, ×2
        "u160": (128, s32 * 8),    # upconv4: cat(f80,u80)=384 → 128, ×2
        "u320": (64, s32 * 16),    # upconv5: cat(f160,u160)=192 → 64, ×2
        "mask": (1, input_size),   # upconv6: deconv ×2 + sigmoid
    }


def db_head_plan(input_size: int = 1024) -> dict[str, tuple[int, int]]:
    """(channels, spatial) of the DBHead path fed by UnetHead's
    TEXTDET_DET outputs (DBHead.forward, basemodel.py:106-125)."""
    u = unet_head_plan(input_size)
    return {
        "u80": u["u80"],
        "x160": (128, u["u160"][1]),        # upconv4 then 1×1 conv → 64
        # binarize/thresh towers: two ×2 deconvs on the /4 feature
        # ("128@160" on a 640 input, basemodel.py:110) → FULL input size.
        # (Corrected from input_size // 2 by the numpy reference forward —
        # npnet.py — which executes the enumerated layout end-to-end; the
        # surrogate's (2, S, S) lines_map always had the true contract.)
        "shrink": (1, input_size),
        "thresh": (1, input_size),
        "lines_map": (2, input_size),       # cat(shrink, thresh)
    }


# ---------------------------------------------------------------------------
# State-dict enumerators (pure; the layout contract for the torch builders)
# ---------------------------------------------------------------------------

def _conv_shapes(prefix, c1, c2, k=1, g=1, fused=False):
    """Conv module (common.py:30-50): conv(bias=False)+BN, or fused
    conv(bias=True)."""
    kk = (k, k) if isinstance(k, int) else tuple(k)
    out = {f"{prefix}.conv.weight": (c2, c1 // g) + kk}
    if fused:
        out[f"{prefix}.conv.bias"] = (c2,)
    else:
        for s in ("weight", "bias", "running_mean", "running_var"):
            out[f"{prefix}.bn.{s}"] = (c2,)
        out[f"{prefix}.bn.num_batches_tracked"] = ()
    return out


def _bottleneck_shapes(prefix, c1, c2, e=0.5, g=1, fused=False):
    c_ = int(c2 * e)
    return {**_conv_shapes(f"{prefix}.cv1", c1, c_, 1, fused=fused),
            **_conv_shapes(f"{prefix}.cv2", c_, c2, 3, g=g, fused=fused)}


def _c3_shapes(prefix, c1, c2, n=1, e=0.5, fused=False):
    c_ = int(c2 * e)
    out = {**_conv_shapes(f"{prefix}.cv1", c1, c_, 1, fused=fused),
           **_conv_shapes(f"{prefix}.cv2", c1, c_, 1, fused=fused),
           **_conv_shapes(f"{prefix}.cv3", 2 * c_, c2, 1, fused=fused)}
    for j in range(n):
        out.update(_bottleneck_shapes(f"{prefix}.m.{j}", c_, c_, e=1.0,
                                      fused=fused))
    return out


def _spp_shapes(prefix, c1, c2, nk=3, fused=False):
    c_ = c1 // 2
    return {**_conv_shapes(f"{prefix}.cv1", c1, c_, 1, fused=fused),
            **_conv_shapes(f"{prefix}.cv2", c_ * (nk + 1), c2, 1,
                           fused=fused)}


def _bare_bn_shapes(prefix, c):
    """A standalone nn.BatchNorm2d inside a Sequential — NOT fused by
    prodmodel.fuse_state_dict (its keys are ``<seq>.<i>.weight``, not the
    Conv-module ``<p>.bn.weight`` layout)."""
    out = {f"{prefix}.{s}": (c,) for s in
           ("weight", "bias", "running_mean", "running_var")}
    out[f"{prefix}.num_batches_tracked"] = ()
    return out


def _dcu_shapes(prefix, in_ch, mid_ch, out_ch, fused=False):
    """double_conv_up_c3 (basemodel.py:20-31): C3 + deconv + BN + ReLU."""
    out = _c3_shapes(f"{prefix}.conv.0", in_ch + mid_ch, mid_ch, fused=fused)
    out[f"{prefix}.conv.1.weight"] = (mid_ch, out_ch, 4, 4)   # deconv, no bias
    out.update(_bare_bn_shapes(f"{prefix}.conv.2", out_ch))
    return out


def unet_head_param_shapes(fused: bool = False) -> dict[str, tuple]:
    """Full UnetHead state-dict layout (basemodel.py:47-60)."""
    out = {}
    out.update(_c3_shapes("down_conv1.conv", 512, 512, fused=fused))
    out.update(_dcu_shapes("upconv0", 0, 512, 256, fused=fused))
    out.update(_dcu_shapes("upconv2", 256, 512, 256, fused=fused))
    out.update(_dcu_shapes("upconv3", 0, 512, 256, fused=fused))
    out.update(_dcu_shapes("upconv4", 128, 256, 128, fused=fused))
    out.update(_dcu_shapes("upconv5", 64, 128, 64, fused=fused))
    out["upconv6.0.weight"] = (64, 1, 4, 4)
    return out


def db_head_param_shapes(in_channels: int = 64,
                         fused: bool = False) -> dict[str, tuple]:
    """Full DBHead state-dict layout (basemodel.py:83-157).  The plain
    Conv2d+BN Sequentials (conv / binarize / thresh) keep their BNs in both
    forms — TextDetBase.fuse only folds yolov5-style Conv modules
    (basemodel.py:228-238)."""
    c, q = in_channels, in_channels // 4
    out = {}
    out.update(_dcu_shapes("upconv3", 0, 512, 256, fused=fused))
    out.update(_dcu_shapes("upconv4", 128, 256, 128, fused=fused))
    out["conv.0.weight"] = (c, 128, 1, 1)
    out["conv.0.bias"] = (c,)
    out.update(_bare_bn_shapes("conv.1", c))
    # binarize: Conv2d(3x3) BN ReLU Deconv(2,2) BN ReLU Deconv(2,2)
    out["binarize.0.weight"] = (q, c, 3, 3)
    out["binarize.0.bias"] = (q,)
    out.update(_bare_bn_shapes("binarize.1", q))
    out["binarize.3.weight"] = (q, q, 2, 2)
    out["binarize.3.bias"] = (q,)
    out.update(_bare_bn_shapes("binarize.4", q))
    out["binarize.6.weight"] = (q, 1, 2, 2)
    out["binarize.6.bias"] = (1,)
    # thresh (bias=False conv, _init_thresh basemodel.py:130-143)
    out["thresh.0.weight"] = (q, c, 3, 3)
    out.update(_bare_bn_shapes("thresh.1", q))
    out["thresh.3.weight"] = (q, q, 2, 2)
    out["thresh.3.bias"] = (q,)
    out.update(_bare_bn_shapes("thresh.4", q))
    out["thresh.6.weight"] = (q, 1, 2, 2)
    out["thresh.6.bias"] = (1,)
    return out


def yolo_param_shapes(cfg: dict | None = None,
                      fused: bool = False) -> dict[str, tuple]:
    """State-dict layout of the yolov5 Model built from ``cfg``
    (parse_model, yolo.py:208-262), module set restricted to what the
    text-detector checkpoints use (Focus/Conv/C3/SPP/SPPF/Concat/Upsample/
    Detect)."""
    cfg = cfg or YOLOV5S_CFG
    plans, _ = plan_yolo_model(cfg)
    na = len(cfg["anchors"][0]) // 2
    no = na * (cfg["nc"] + 5)
    out = {}
    for p in plans:
        pre = f"model.{p.i}"
        if p.module == "Conv":
            out.update(_conv_shapes(pre, p.args[0], p.args[1],
                                    p.args[2] if len(p.args) > 2 else 1,
                                    fused=fused))
        elif p.module == "Focus":
            out.update(_conv_shapes(f"{pre}.conv", p.args[0] * 4, p.args[1],
                                    p.args[2] if len(p.args) > 2 else 1,
                                    fused=fused))
        elif p.module == "C3":
            out.update(_c3_shapes(pre, p.args[0], p.args[1], n=p.args[2],
                                  fused=fused))
        elif p.module == "SPP":
            out.update(_spp_shapes(pre, p.args[0], p.args[1],
                                   nk=len(p.args[2]), fused=fused))
        elif p.module == "SPPF":
            out.update(_spp_shapes(pre, p.args[0], p.args[1], nk=3,
                                   fused=fused))
        elif p.module == "Detect":
            out[f"{pre}.anchors"] = (len(cfg["anchors"]), na, 2)
            for j, ch_in in enumerate(p.args[2]):
                out[f"{pre}.m.{j}.weight"] = (no, ch_in, 1, 1)
                out[f"{pre}.m.{j}.bias"] = (no,)
        elif p.module in ("Concat", "nn.Upsample"):
            pass
        else:
            raise NotImplementedError(
                f"yolo module {p.module!r} not supported by this rebuild")
    return out


def synthetic_state_dict(shapes: dict[str, tuple],
                         seed: int = 0) -> dict[str, np.ndarray]:
    """Deterministic random arrays matching an enumerator's layout — for
    in-sandbox fuse/load parity tests and small smoke forwards."""
    rng = np.random.default_rng(seed)
    out = {}
    for k, shp in shapes.items():
        if k.endswith("num_batches_tracked"):
            out[k] = np.asarray(0, dtype=np.int64)
        elif k.endswith("running_var"):
            out[k] = rng.uniform(0.5, 1.5, shp).astype(np.float32)
        else:
            out[k] = rng.normal(0, 0.05, shp).astype(np.float32)
    return out


# ---------------------------------------------------------------------------
# Torch builders (import-gated; layout must equal the enumerators above)
# ---------------------------------------------------------------------------

_TORCH_NS = None


def _nets():
    """Define the torch module classes once per process.  Raises
    NotImplementedError (not ImportError) when torch is absent so callers
    get the same signal as the rest of the prod path."""
    global _TORCH_NS
    if _TORCH_NS is not None:
        return _TORCH_NS
    try:
        import torch
        import torch.nn as nn
    except ImportError as e:  # pragma: no cover - torch absent in sandbox
        raise NotImplementedError(
            "network assembly requires torch; use SurrogateDetector in "
            "environments without it") from e

    # pragma: no cover begins — everything below needs torch.
    def _act(act):
        # common.py:36-44: bool → SiLU/Identity, 'leaky' → LeakyReLU(0.1)
        if isinstance(act, bool):
            return nn.SiLU() if act else nn.Identity()
        if act == "leaky":
            return nn.LeakyReLU(0.1, inplace=True)
        if act == "relu":
            return nn.ReLU(inplace=True)
        if isinstance(act, nn.Module):
            return act
        return nn.Identity()

    class ConvBlock(nn.Module):
        """common.py:30-50 Conv; ``fused=True`` builds the post-fuse form
        (conv with bias, no bn — TextDetBase.fuse / Model.fuse output)."""

        def __init__(self, c1, c2, k=1, s=1, p=None, g=1, act=True,
                     fused=False):
            super().__init__()
            self.conv = nn.Conv2d(c1, c2, k, s, autopad(k, p), groups=g,
                                  bias=fused)
            if not fused:
                self.bn = nn.BatchNorm2d(c2)
            self.fused = fused
            self.act = _act(act)

        def forward(self, x):
            if self.fused:
                return self.act(self.conv(x))
            return self.act(self.bn(self.conv(x)))

    class Bottleneck(nn.Module):
        def __init__(self, c1, c2, shortcut=True, g=1, e=0.5, act=True,
                     fused=False):
            super().__init__()
            c_ = int(c2 * e)
            self.cv1 = ConvBlock(c1, c_, 1, 1, act=act, fused=fused)
            self.cv2 = ConvBlock(c_, c2, 3, 1, g=g, act=act, fused=fused)
            self.add = shortcut and c1 == c2

        def forward(self, x):
            y = self.cv2(self.cv1(x))
            return x + y if self.add else y

    class C3(nn.Module):
        def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5, act=True,
                     fused=False):
            super().__init__()
            c_ = int(c2 * e)
            self.cv1 = ConvBlock(c1, c_, 1, 1, act=act, fused=fused)
            self.cv2 = ConvBlock(c1, c_, 1, 1, act=act, fused=fused)
            self.cv3 = ConvBlock(2 * c_, c2, 1, act=act, fused=fused)
            self.m = nn.Sequential(*(Bottleneck(c_, c_, shortcut, g, e=1.0,
                                                act=act, fused=fused)
                                     for _ in range(n)))

        def forward(self, x):
            return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)),
                                      dim=1))

    class SPP(nn.Module):
        def __init__(self, c1, c2, k=(5, 9, 13), fused=False):
            super().__init__()
            c_ = c1 // 2
            self.cv1 = ConvBlock(c1, c_, 1, 1, fused=fused)
            self.cv2 = ConvBlock(c_ * (len(k) + 1), c2, 1, 1, fused=fused)
            self.m = nn.ModuleList(nn.MaxPool2d(x, 1, x // 2) for x in k)

        def forward(self, x):
            x = self.cv1(x)
            return self.cv2(torch.cat([x] + [m(x) for m in self.m], 1))

    class SPPF(nn.Module):
        def __init__(self, c1, c2, k=5, fused=False):
            super().__init__()
            c_ = c1 // 2
            self.cv1 = ConvBlock(c1, c_, 1, 1, fused=fused)
            self.cv2 = ConvBlock(c_ * 4, c2, 1, 1, fused=fused)
            self.m = nn.MaxPool2d(k, 1, k // 2)

        def forward(self, x):
            x = self.cv1(x)
            y1 = self.m(x)
            y2 = self.m(y1)
            return self.cv2(torch.cat([x, y1, y2, self.m(y2)], 1))

    class Focus(nn.Module):
        """Space-to-depth stem (common.py:199-209)."""

        def __init__(self, c1, c2, k=1, s=1, p=None, g=1, act=True,
                     fused=False):
            super().__init__()
            self.conv = ConvBlock(c1 * 4, c2, k, s, p, g, act=act,
                                  fused=fused)

        def forward(self, x):
            return self.conv(torch.cat(
                [x[..., ::2, ::2], x[..., 1::2, ::2],
                 x[..., ::2, 1::2], x[..., 1::2, 1::2]], 1))

    class Concat(nn.Module):
        def __init__(self, dimension=1):
            super().__init__()
            self.d = dimension

        def forward(self, x):
            return torch.cat(x, self.d)

    class Detect(nn.Module):
        """yolo.py:7-56 inference path (training branch omitted — this
        rebuild is inference-only)."""

        def __init__(self, nc=80, anchors=(), ch=(), strides=None):
            super().__init__()
            self.nc = nc
            self.no = nc + 5
            self.nl = len(anchors)
            self.na = len(anchors[0]) // 2
            self.grid = [torch.zeros(1)] * self.nl
            self.anchor_grid = [torch.zeros(1)] * self.nl
            self.register_buffer(
                "anchors",
                torch.tensor(anchors).float().view(self.nl, -1, 2))
            self.m = nn.ModuleList(nn.Conv2d(x, self.no * self.na, 1)
                                   for x in ch)
            self.stride = torch.tensor(
                [float(s) for s in (strides or [8, 16, 32])])

        def forward(self, x):
            z = []
            for i in range(self.nl):
                xi = self.m[i](x[i])
                bs, _, ny, nx = xi.shape
                xi = (xi.view(bs, self.na, self.no, ny, nx)
                        .permute(0, 1, 3, 4, 2).contiguous())
                if self.grid[i].shape[2:4] != xi.shape[2:4]:
                    self.grid[i], self.anchor_grid[i] = self._make_grid(
                        nx, ny, i)
                y = xi.sigmoid()
                xy = (y[..., 0:2] * 2 - 0.5 + self.grid[i]) * self.stride[i]
                wh = (y[..., 2:4] * 2) ** 2 * self.anchor_grid[i]
                y = torch.cat((xy, wh, y[..., 4:]), -1)
                z.append(y.view(bs, -1, self.no))
            return torch.cat(z, 1)

        def _make_grid(self, nx, ny, i):
            d = self.anchors.device
            yv, xv = torch.meshgrid(
                torch.arange(ny, device=d), torch.arange(nx, device=d),
                indexing="ij")
            grid = (torch.stack((xv, yv), 2)
                    .expand(1, self.na, ny, nx, 2).float())
            anchor_grid = ((self.anchors[i] * self.stride[i])
                           .view(1, self.na, 1, 1, 2)
                           .expand(1, self.na, ny, nx, 2).float())
            return grid, anchor_grid

    class YoloModel(nn.Module):
        """yolov5 Model rebuilt from a LayerPlan list (yolo.py:57-134),
        with the reference's out_indices tap protocol: forward(detect=True)
        returns (detect_rows, [tap features]) (yolo.py:118-133).

        The Detect buffer ``anchors`` is stride-normalized in checkpoints
        (saved after Model.__init__'s ``m.anchors /= stride``,
        yolo.py:88-89) so loading the buffer verbatim is correct."""

        def __init__(self, plans, save, nc, anchors, fused=True,
                     out_indices=OUT_INDICES):
            super().__init__()
            strides = detect_strides(plans)
            layers = []
            for p in plans:
                if p.module == "Conv":
                    mod = ConvBlock(*p.args, fused=fused)
                elif p.module == "Focus":
                    mod = Focus(*p.args, fused=fused)
                elif p.module == "C3":
                    mod = C3(*p.args, fused=fused)
                elif p.module == "SPP":
                    mod = SPP(*p.args, fused=fused)
                elif p.module == "SPPF":
                    mod = SPPF(*p.args, fused=fused)
                elif p.module == "Concat":
                    mod = Concat(*p.args)
                elif p.module == "nn.Upsample":
                    mod = nn.Upsample(None, *p.args[1:])
                elif p.module == "Detect":
                    mod = Detect(p.args[0], p.args[1], p.args[2],
                                 strides=strides)
                else:
                    raise NotImplementedError(
                        f"yolo module {p.module!r} not supported")
                mod.i, mod.f = p.i, p.f
                layers.append(mod)
            self.model = nn.Sequential(*layers)
            self.save = sorted(save)
            self.out_indices = list(out_indices)

        def forward(self, x, detect=False):
            y, z = [], []
            for m in self.model:
                if m.f != -1:
                    x = (y[m.f] if isinstance(m.f, int)
                         else [x if j == -1 else y[j] for j in m.f])
                x = m(x)
                y.append(x if m.i in self.save else None)
                if m.i in self.out_indices:
                    z.append(x)
            if detect:
                return x, z
            return z

    class DoubleConvUpC3(nn.Module):
        """basemodel.py:20-31 double_conv_up_c3 — state-dict layout
        ``conv.{0,1,2}``; the deconv+BN pair survives fusion untouched."""

        def __init__(self, in_ch, mid_ch, out_ch, act=True, fused=False):
            super().__init__()
            self.conv = nn.Sequential(
                C3(in_ch + mid_ch, mid_ch, act=act, fused=fused),
                nn.ConvTranspose2d(mid_ch, out_ch, 4, 2, 1, bias=False),
                nn.BatchNorm2d(out_ch),
                nn.ReLU(inplace=True))

        def forward(self, x):
            return self.conv(x)

    class DoubleConvC3(nn.Module):
        """basemodel.py:33-44 double_conv_c3 (down=None guard added —
        the reference only ever builds it with stride 2)."""

        def __init__(self, in_ch, out_ch, stride=1, act=True, fused=False):
            super().__init__()
            self.down = nn.AvgPool2d(2, stride=2) if stride > 1 else None
            self.conv = C3(in_ch, out_ch, act=act, fused=fused)

        def forward(self, x):
            if self.down is not None:
                x = self.down(x)
            return self.conv(x)

    class UnetHead(nn.Module):
        """basemodel.py:47-80, inference modes only."""

        def __init__(self, act=True, fused=False):
            super().__init__()
            self.down_conv1 = DoubleConvC3(512, 512, 2, act=act, fused=fused)
            self.upconv0 = DoubleConvUpC3(0, 512, 256, act=act, fused=fused)
            self.upconv2 = DoubleConvUpC3(256, 512, 256, act=act, fused=fused)
            self.upconv3 = DoubleConvUpC3(0, 512, 256, act=act, fused=fused)
            self.upconv4 = DoubleConvUpC3(128, 256, 128, act=act, fused=fused)
            self.upconv5 = DoubleConvUpC3(64, 128, 64, act=act, fused=fused)
            self.upconv6 = nn.Sequential(
                nn.ConvTranspose2d(64, 1, 4, 2, 1, bias=False),
                nn.Sigmoid())

        def forward(self, f160, f80, f40, f20, f3, mode="inference"):
            d10 = self.down_conv1(f3)
            u20 = self.upconv0(d10)
            u40 = self.upconv2(torch.cat([f20, u20], dim=1))
            if mode == "det":
                return f80, f40, u40
            u80 = self.upconv3(torch.cat([f40, u40], dim=1))
            u160 = self.upconv4(torch.cat([f80, u80], dim=1))
            u320 = self.upconv5(torch.cat([f160, u160], dim=1))
            mask = self.upconv6(u320)
            if mode == "mask":
                return mask
            return mask, [f80, f40, u40]

    class DBHead(nn.Module):
        """basemodel.py:83-160, inference path (step_eval=False returns
        cat(shrink, thresh) — the lines_map contract)."""

        def __init__(self, in_channels=64, k=50, act=True, fused=False):
            super().__init__()
            self.k = k
            q = in_channels // 4
            self.upconv3 = DoubleConvUpC3(0, 512, 256, act=act, fused=fused)
            self.upconv4 = DoubleConvUpC3(128, 256, 128, act=act, fused=fused)
            self.conv = nn.Sequential(
                nn.Conv2d(128, in_channels, 1),
                nn.BatchNorm2d(in_channels),
                nn.ReLU(inplace=True))
            self.binarize = nn.Sequential(
                nn.Conv2d(in_channels, q, 3, padding=1),
                nn.BatchNorm2d(q), nn.ReLU(inplace=True),
                nn.ConvTranspose2d(q, q, 2, 2),
                nn.BatchNorm2d(q), nn.ReLU(inplace=True),
                nn.ConvTranspose2d(q, 1, 2, 2))
            self.thresh = nn.Sequential(
                nn.Conv2d(in_channels, q, 3, padding=1, bias=False),
                nn.BatchNorm2d(q), nn.ReLU(inplace=True),
                nn.ConvTranspose2d(q, q, 2, 2),
                nn.BatchNorm2d(q), nn.ReLU(inplace=True),
                nn.ConvTranspose2d(q, 1, 2, 2),
                nn.Sigmoid())

        def forward(self, f80, f40, u40, step_eval=False):
            u80 = self.upconv3(torch.cat([f40, u40], dim=1))
            x = self.upconv4(torch.cat([f80, u80], dim=1))
            x = self.conv(x)
            threshold_maps = self.thresh(x)
            shrink_maps = torch.sigmoid(self.binarize(x))
            if step_eval:
                return torch.reciprocal(
                    1 + torch.exp(-self.k * (shrink_maps - threshold_maps)))
            return torch.cat((shrink_maps, threshold_maps), dim=1)

    import types
    _TORCH_NS = types.SimpleNamespace(
        torch=torch, nn=nn, ConvBlock=ConvBlock, Bottleneck=Bottleneck,
        C3=C3, SPP=SPP, SPPF=SPPF, Focus=Focus, Concat=Concat,
        Detect=Detect, YoloModel=YoloModel, DoubleConvUpC3=DoubleConvUpC3,
        DoubleConvC3=DoubleConvC3, UnetHead=UnetHead, DBHead=DBHead)
    return _TORCH_NS


def load_numpy_state_dict(module, sd: dict, strict: bool = True):
    """Load a numpy state dict (the prodmodel output format) into a torch
    module; name+shape intersection like yolov5's intersect_dicts
    (utils/yolov5_utils.py:69-71) with a strict missing-key report."""
    ns = _nets()
    target = module.state_dict()
    tensors, skipped = {}, []
    for k, v in sd.items():
        if k in target and tuple(target[k].shape) == tuple(np.shape(v)):
            tensors[k] = ns.torch.as_tensor(np.asarray(v))
        else:
            skipped.append(k)
    missing = [k for k in target if k not in tensors]
    if strict and missing:
        raise KeyError(f"state dict missing {len(missing)} keys for "
                       f"{type(module).__name__}: {missing[:8]}...")
    module.load_state_dict(tensors, strict=False)
    return skipped


def build_yolov5(cfg: dict | None = None, fused: bool = True,
                 out_indices=OUT_INDICES):
    """Rebuild the yolov5 Model from a checkpoint cfg dict
    (load_yolov5_ckpt, yolo.py:286-311), fused by default like the
    reference's ``fuse=True`` path."""
    ns = _nets()
    cfg = cfg or YOLOV5S_CFG
    plans, save = plan_yolo_model(cfg)
    return ns.YoloModel(plans, save, cfg["nc"], cfg["anchors"], fused=fused,
                        out_indices=out_indices).eval()


def build_unet_head(act="leaky", fused: bool = True):
    ns = _nets()
    return ns.UnetHead(act=act, fused=fused).eval()


def build_db_head(in_channels: int = 64, act="leaky", fused: bool = True):
    ns = _nets()
    return ns.DBHead(in_channels=in_channels, act=act, fused=fused).eval()


class TextDetBaseNet:
    """The fused triple forward (TextDetBase.forward, basemodel.py:240-244):
    blob → (blks (1,N,5+nc), mask (1,1,S,S), lines_map (1,2,S,S)), numpy
    in / numpy out so the caller never sees torch types."""

    def __init__(self, blk_det, text_seg, text_det, device="cpu",
                 half=False):
        ns = _nets()
        self._torch = ns.torch
        self.device = device
        self.half = half
        dtype = ns.torch.float16 if half else ns.torch.float32
        self.blk_det = blk_det.to(device=device, dtype=dtype)
        self.text_seg = text_seg.to(device=device, dtype=dtype)
        self.text_det = text_det.to(device=device, dtype=dtype)

    def __call__(self, blob: np.ndarray):
        torch = self._torch
        with torch.no_grad():
            x = torch.as_tensor(
                np.ascontiguousarray(blob),
                dtype=torch.float16 if self.half else torch.float32,
                device=self.device)
            blks, feats = self.blk_det(x, detect=True)
            mask, det_feats = self.text_seg(*feats, mode="inference")
            lines = self.text_det(*det_feats, step_eval=False)
        to_np = lambda t: t.float().cpu().numpy()
        return to_np(blks), to_np(mask), to_np(lines)


def default_network_factory(state_dicts: dict, device: str = "cpu",
                            half: bool = False, blk_cfg: dict | None = None,
                            act="leaky"):
    """The factory ``TorchDetector`` uses when none is supplied: build the
    three fused nets from numpy state dicts (prodmodel.split_checkpoint +
    fuse_state_dict output) and return the callable triple forward.

    ``blk_cfg`` is the cfg dict embedded in the checkpoint's blk_det entry
    (yolo.py:292); falls back to the public yolov5s layout."""
    blk = build_yolov5(blk_cfg, fused=True)
    seg = build_unet_head(act=act, fused=True)
    det = build_db_head(64, act=act, fused=True)
    load_numpy_state_dict(blk, state_dicts["blk_det"])
    load_numpy_state_dict(seg, state_dicts["text_seg"])
    load_numpy_state_dict(det, state_dicts["text_det"])
    return TextDetBaseNet(blk, seg, det, device=device, half=half)

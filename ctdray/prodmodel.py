"""Production checkpoint plumbing — the PURE parts, in numpy.

The reference's prod path loads one fused checkpoint and splits it into the
three sub-models (``get_base_det_models``, basemodel.py:211-220), rebuilds
YOLOv5 from the embedded state dict (models/yolov5/yolo.py:286-311), and
fuses every Conv+BatchNorm pair into a single conv
(``fuse_conv_and_bn``, utils/yolov5_utils.py:23-43).  All of that math is
framework-free: it is linear algebra over the state-dict arrays.  This
module implements it in numpy so it is unit-testable in this sandbox (no
torch) and reusable verbatim by the torch/ONNX backends in
ctdray.surrogate.
"""
from __future__ import annotations

import numpy as np

CKPT_KEYS = ("blk_det", "text_seg", "text_det")   # basemodel.py:212-217


def split_checkpoint(ckpt: dict) -> tuple[dict, dict, dict]:
    """One fused checkpoint dict → (blk_det, text_seg, text_det) sub-dicts
    (basemodel.py:211-217).  Raises KeyError listing what is missing."""
    missing = [k for k in CKPT_KEYS if k not in ckpt]
    if missing:
        raise KeyError(f"checkpoint missing sub-model entries: {missing}; "
                       f"expected keys {CKPT_KEYS}")
    return ckpt["blk_det"], ckpt["text_seg"], ckpt["text_det"]


def fuse_conv_bn_arrays(w_conv: np.ndarray, b_conv: np.ndarray | None,
                        gamma: np.ndarray, beta: np.ndarray,
                        running_mean: np.ndarray, running_var: np.ndarray,
                        eps: float = 1e-5) -> tuple[np.ndarray, np.ndarray]:
    """Conv+BN fusion (utils/yolov5_utils.py:23-43) on raw arrays:

        scale = γ / sqrt(var + ε)
        W'    = diag(scale) @ W.reshape(out, -1)   → W's shape
        b'    = scale · (b_conv − mean) + β

    ``w_conv`` is (out, in, kh, kw); returns (w_fused, b_fused)."""
    out_ch = w_conv.shape[0]
    scale = gamma / np.sqrt(running_var + eps)
    w_fused = (scale[:, None] * w_conv.reshape(out_ch, -1)).reshape(w_conv.shape)
    if b_conv is None:
        b_conv = np.zeros(out_ch, dtype=w_conv.dtype)
    b_fused = scale * (b_conv - running_mean) + beta
    return w_fused.astype(w_conv.dtype), b_fused.astype(w_conv.dtype)


def fuse_state_dict(sd: dict, eps_key_suffix: str = "bn.eps",
                    default_eps: float = 1e-3) -> dict:
    """Walk a state dict laid out like the reference's ``Conv`` module
    (``<prefix>.conv.weight`` + ``<prefix>.bn.{weight,bias,running_mean,
    running_var}``, models/yolov5/common.py Conv) and fold every BN into its
    conv — the state-dict-level equivalent of ``TextDetBase.fuse``
    (basemodel.py:228-238).  Non-matching entries pass through untouched;
    ``num_batches_tracked`` bookkeeping is dropped with the BN.

    The default eps matches the yolov5 backbone, whose BNs train with
    eps=1e-3 (initialize_weights, utils/yolov5_utils.py:55-60, applied in
    Model.__init__).  UnetHead/DBHead BNs keep the PyTorch default 1e-5
    (basemodel.py creates them bare and utils/weight_init.py:91-103 never
    touches eps) — pass ``default_eps=1e-5`` for those sub-dicts, as
    TorchDetector does."""
    out = dict(sd)
    prefixes = set()
    for k in sd:
        if k.endswith(".conv.weight"):
            p = k[: -len(".conv.weight")]
            if f"{p}.bn.weight" in sd:
                prefixes.add(p)
    for p in sorted(prefixes):
        w = np.asarray(sd[f"{p}.conv.weight"])
        b = sd.get(f"{p}.conv.bias")
        b = None if b is None else np.asarray(b)
        w_f, b_f = fuse_conv_bn_arrays(
            w, b,
            np.asarray(sd[f"{p}.bn.weight"]),
            np.asarray(sd[f"{p}.bn.bias"]),
            np.asarray(sd[f"{p}.bn.running_mean"]),
            np.asarray(sd[f"{p}.bn.running_var"]),
            eps=float(sd.get(f"{p}.{eps_key_suffix}", default_eps)),
        )
        out[f"{p}.conv.weight"] = w_f
        out[f"{p}.conv.bias"] = b_f
        for suffix in ("weight", "bias", "running_mean", "running_var",
                       "num_batches_tracked"):
            out.pop(f"{p}.bn.{suffix}", None)
    return out


def fix_reversed_outputs(blks, mask, lines_map):
    """Channel-swap quirk of the cv2.dnn ONNX path: some OpenCV versions
    return (blks, lines_map, mask) — detectable because the real mask has 1
    channel and the DB maps have 2 (inference.py:151-155)."""
    if mask is not None and getattr(mask, "shape", (0, 0))[1] == 2:
        mask, lines_map = lines_map, mask
    return blks, mask, lines_map


def preprocess_blob(img: np.ndarray, input_size: int) -> tuple:
    """Page → model input blob: BGR→RGB, letterbox to (S, S), CHW, /255
    float32 (inference.py:72-83 preprocess_img; cv2.dnn.blobFromImage
    equivalent for the ONNX path).  Returns (blob (1,3,S,S), dw, dh)."""
    from .geom import letterbox_image, letterbox_params

    im_h, im_w = img.shape[:2]
    _, new_w, new_h, dw, dh = letterbox_params(im_h, im_w, input_size)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    boxed, _r, _pad = letterbox_image(img, input_size)
    rgb = boxed[:, :, ::-1]
    blob = (rgb.astype(np.float32) / 255.0).transpose(2, 0, 1)[None]
    return np.ascontiguousarray(blob), dw, dh

"""Detector backends.

The reference switches between a fused torch model and an OpenCV-DNN ONNX
model by file suffix (inference.py:124-130); this engine makes the backend an
injected object with one method::

    infer(media_ref, im_h, im_w) -> (blks, mask, lines_map)

with exactly the reference's inference output contract (basemodel.py:240-244):

  blks      float32 (1, N, 5+nc)  raw YOLO rows, letterboxed coords
  mask      float32 (1, 1, S, S)  UNet sigmoid text mask
  lines_map float32 (1, 2, S, S)  DB shrink + threshold maps (ch 0 consumed)

Backends: :class:`SurrogateDetector` (deterministic, sandbox — derives the
tensors analytically from the fixture ground truth, FIXTURES.md §3) and
:class:`TorchDetector` / :class:`OnnxDetector` which load real weights when
torch / cv2 are importable (never in this sandbox); the torch network
assembly itself lives in ctdray.nets.
"""
from __future__ import annotations

import numpy as np

from .config import DetectorConfig
from .fixtures import page_ground_truth
from .geom import fill_convex_poly, letterbox_params, shrink_poly

NUM_CLASSES = 3  # eng / ja / unknown (inference.py:117-118)


class SurrogateDetector:
    """Deterministic stand-in for TextDetBase.forward (basemodel.py:222-244).

    Output maps are synthesized in letterboxed coordinates from the page's
    seeded ground truth: YOLO rows for (detected) blocks plus duplicate and
    sub-threshold noise rows to exercise NMS; the DB shrink map holds each
    line quad shrunk by the DBNet ratio 0.4 (utils/db_utils.py:533,560-566)
    so binarize→minrect→unclip recovers the line; the mask holds the unshrunk
    quads.  Stateless w.r.t. pixels — everything derives from media_ref +
    page shape, which is exactly what makes the oracle reproducible on any
    worker.
    """

    def __init__(self, cfg: DetectorConfig | None = None,
                 reuse_buffers: bool | None = None):
        self.cfg = cfg or DetectorConfig()
        if reuse_buffers is None:
            import os
            reuse_buffers = os.environ.get("CTDRAY_MAP_REUSE", "1") != "0"
        # Output-map reuse (dirty-rect reset): the (S, S) mask + (2, S, S)
        # lines maps are 12 MB/page of calloc'd zeros — ~15% of the fused
        # chain was the allocator zero-filling pages the painter immediately
        # overwrites.  Reusing per-detector buffers and zeroing only the
        # rects painted by the PREVIOUS call restores a bit-identical
        # pristine canvas (every nonzero pixel is inside a recorded
        # fill_convex_poly bbox, by induction from a zero buffer).  The
        # contract this imposes is the standard inference-backend one (cv2's
        # reused output Mats): returned maps are views valid until the next
        # ``infer`` on this instance; callers that keep maps copy them —
        # every engine stage already consumes or encodes per page before the
        # next call (stages/detect.py, stages/refine.py ``.full()``).
        self._reuse = bool(reuse_buffers)
        self._mask_buf = None
        self._lines_buf = None
        self._dirty_mask: list = []
        self._dirty_lines: list = []

    def infer(self, media_ref: str, im_h: int, im_w: int):
        cfg = self.cfg
        size = cfg.input_size
        gt = page_ground_truth(media_ref)
        r, new_w, new_h, dw, dh = letterbox_params(im_h, im_w, size)
        # Exact inverse of the reference's unmapping resize_ratio
        # (inference.py:147): model coords = original · (new/orig) per axis.
        sx, sy = new_w / im_w, new_h / im_h
        rng = np.random.default_rng((hash_seed := _stable_seed(media_ref)))

        rows = []
        for blk in gt.blocks:
            if not blk.detected:
                continue
            x1, y1, x2, y2 = blk.bbox
            x1, x2 = x1 * sx, x2 * sx
            y1, y2 = y1 * sy, y2 * sy
            rows.append(_yolo_row((x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1,
                                  blk.conf, blk.cls_id))
            if rng.random() < 0.4:   # overlapping duplicate → suppressed by NMS
                jx, jy = rng.uniform(-4, 4, 2)
                rows.append(_yolo_row((x1 + x2) / 2 + jx, (y1 + y2) / 2 + jy,
                                      (x2 - x1) * rng.uniform(0.95, 1.05),
                                      (y2 - y1) * rng.uniform(0.95, 1.05),
                                      blk.conf * 0.8, blk.cls_id))
        for (bx1, by1, bx2, by2), conf in gt.empty_boxes:
            rows.append(_yolo_row((bx1 + bx2) / 2 * sx, (by1 + by2) / 2 * sy,
                                  (bx2 - bx1) * sx, (by2 - by1) * sy, conf, 2))
        for (bx1, by1, bx2, by2), conf, cls_id in gt.noise_boxes:
            rows.append(_yolo_row((bx1 + bx2) / 2 * sx, (by1 + by2) / 2 * sy,
                                  (bx2 - bx1) * sx, (by2 - by1) * sy, conf, cls_id))
        blks = (np.stack(rows) if rows else np.zeros((0, 5 + NUM_CLASSES)))
        blks = blks[None].astype(np.float32)

        # Background stays 0.0 (calloc'd) — below every threshold, and ~60×
        # cheaper than np.full on 12 MB of maps.  With reuse on, only the
        # rects painted by the previous call are re-zeroed (see __init__).
        if self._reuse:
            mask, lines_map = self._mask_buf, self._lines_buf
            if mask is None or mask.shape[0] != size:
                mask = self._mask_buf = np.zeros((size, size),
                                                 dtype=np.float32)
                lines_map = self._lines_buf = np.zeros((2, size, size),
                                                       dtype=np.float32)
            else:
                l0_buf = lines_map[0]
                for (ry0, ry1, rx0, rx1) in self._dirty_mask:
                    mask[ry0:ry1, rx0:rx1] = 0.0
                for (ry0, ry1, rx0, rx1) in self._dirty_lines:
                    l0_buf[ry0:ry1, rx0:rx1] = 0.0
            dirty_mask = self._dirty_mask = []
            dirty_lines = self._dirty_lines = []
        else:
            mask = np.zeros((size, size), dtype=np.float32)
            lines_map = np.zeros((2, size, size), dtype=np.float32)
            dirty_mask = self._dirty_mask = []
            dirty_lines = self._dirty_lines = []
        scale = np.array([sx, sy])
        l0 = lines_map[0]
        for blk in gt.blocks:
            for quad in blk.lines:
                q = quad * scale
                r = fill_convex_poly(mask, q, 0.9)
                if r is not None:
                    dirty_mask.append(r)
                if blk.in_lines_map:
                    r = fill_convex_poly(l0, shrink_poly(q, 0.4), 0.95)
                    if r is not None:
                        dirty_lines.append(r)
        for quad, value in gt.noise_regions:
            r = fill_convex_poly(l0, np.asarray(quad) * scale, value)
            if r is not None:
                dirty_lines.append(r)
        # Codec hint: these rects bound every nonzero pixel of this call's
        # maps (same induction that makes the dirty-rect reset exact), so
        # the split-layout codec can build its run table from geometry
        # instead of scanning 12 MB of planes (tensorcodec.encode_page_maps
        # ``paint_rects``).  Valid until the next infer on this instance.
        self.last_paint_rects = (dirty_mask, dirty_lines)
        return blks, mask[None, None], lines_map[None]


def _stable_seed(media_ref: str) -> int:
    import hashlib

    return int.from_bytes(hashlib.sha256(b"det:" + media_ref.encode()).digest()[:8], "little")


def _yolo_row(cx, cy, w, h, conf, cls_id):
    row = np.zeros(5 + NUM_CLASSES, dtype=np.float64)
    row[:4] = cx, cy, w, h
    row[4] = conf
    row[5:] = 0.01
    row[5 + int(cls_id)] = 0.98
    return row


class TorchDetector:
    """Production backend: fused YOLOv5s + UNet + DBHead checkpoint
    (basemodel.py:211-244, models/yolov5/yolo.py:286-311).  Weights are an
    external artifact (reference README.md:5); loading happens once per actor
    in ``__init__`` per the actor-pool contract.

    Construction is real end-to-end: the checkpoint is loaded, split into
    the three sub-model state dicts (ctdray.prodmodel.split_checkpoint),
    every Conv+BN pair is folded (prodmodel.fuse_state_dict — the numpy
    re-expression of utils/yolov5_utils.py:23-43, unit-tested in-sandbox),
    and the fused networks themselves are assembled by
    ``ctdray.nets.default_network_factory`` — the re-expression of
    basemodel.py:47-209 (UnetHead/DBHead) and the yolov5 Model rebuild
    (models/yolov5/yolo.py:286-311) — so no ``network_factory`` argument
    is needed.  Pass one only to swap in a custom assembly.

    BN-eps detail: the yolov5 backbone trains with eps=1e-3
    (initialize_weights, utils/yolov5_utils.py:55-60, applied in
    Model.__init__) while UnetHead/DBHead BNs keep the PyTorch default
    1e-5 (basemodel.py creates them bare; utils/weight_init.py:91-103
    never touches eps) — each sub-dict is fused with its own eps."""

    def __init__(self, model_path: str, cfg: DetectorConfig | None = None,
                 device: str = "cpu", half: bool = False,
                 network_factory=None):
        self.cfg = cfg or DetectorConfig()
        self.device = device
        try:
            import torch
        except ImportError as e:  # pragma: no cover - torch absent in sandbox
            raise NotImplementedError(
                "TorchDetector requires torch + model weights; use "
                "SurrogateDetector in environments without them") from e
        from .prodmodel import fuse_state_dict, split_checkpoint

        ckpt = torch.load(model_path, map_location=device)   # raises on missing file
        blk_sd, seg_sd, det_sd = split_checkpoint(ckpt)
        # blk_det entry layout is {'cfg': model dict, 'weights': state dict}
        # (load_yolov5_ckpt, yolo.py:286-293); keep the cfg for the rebuild.
        self.blk_cfg = None
        if isinstance(blk_sd, dict):
            self.blk_cfg = blk_sd.get("cfg")
            blk_sd = blk_sd.get("weights", blk_sd.get("state_dict", blk_sd))
        to_np = lambda d: {k: v.detach().cpu().numpy() if hasattr(v, "detach")
                           else v for k, v in d.items()
                           if hasattr(v, "detach") or isinstance(v, np.ndarray)}
        self.state_dicts = {
            "blk_det": fuse_state_dict(to_np(blk_sd), default_eps=1e-3),
            "text_seg": fuse_state_dict(to_np(seg_sd), default_eps=1e-5),
            "text_det": fuse_state_dict(to_np(det_sd), default_eps=1e-5),
        }
        if network_factory is None:
            from .nets import default_network_factory
            self.net = default_network_factory(
                self.state_dicts, device, half, blk_cfg=self.blk_cfg)
        else:
            self.net = network_factory(self.state_dicts, device, half)

    def infer(self, media_ref, im_h, im_w):  # pragma: no cover - needs weights
        from .prodmodel import preprocess_blob
        from .sources.media import fetch_media
        from .stages.multimodal import decode_image

        img = decode_image(fetch_media(media_ref))
        blob, _dw, _dh = preprocess_blob(img, self.cfg.input_size)
        blks, mask, lines_map = self.net(blob)
        return (np.asarray(blks, dtype=np.float32),
                np.asarray(mask, dtype=np.float32),
                np.asarray(lines_map, dtype=np.float32))


class OnnxDetector:
    """CPU ONNX backend via cv2.dnn (TextDetBaseDNN, basemodel.py:246-256):
    blobFromImage-equivalent preprocessing, one forward over the
    unconnected output layers, and the reversed-output channel-swap quirk
    (inference.py:151-155 — some OpenCV builds emit (blks, lines, mask))
    handled by prodmodel.fix_reversed_outputs.  Constructs for real when
    cv2 is importable; fails only on the missing artifact."""

    def __init__(self, model_path: str, cfg: DetectorConfig | None = None):
        self.cfg = cfg or DetectorConfig()
        try:
            import cv2
        except ImportError as e:  # pragma: no cover - cv2 absent in sandbox
            raise NotImplementedError(
                "OnnxDetector requires cv2; use SurrogateDetector") from e
        self.model = cv2.dnn.readNetFromONNX(model_path)  # raises on bad file
        self.uoln = self.model.getUnconnectedOutLayersNames()

    def infer(self, media_ref, im_h, im_w):  # pragma: no cover - needs artifact
        from .prodmodel import fix_reversed_outputs, preprocess_blob
        from .sources.media import fetch_media
        from .stages.multimodal import decode_image

        img = decode_image(fetch_media(media_ref))
        blob, _dw, _dh = preprocess_blob(img, self.cfg.input_size)
        self.model.setInput(blob)
        blks, mask, lines_map = self.model.forward(self.uoln)
        blks, mask, lines_map = fix_reversed_outputs(blks, mask, lines_map)
        return (np.asarray(blks, dtype=np.float32),
                np.asarray(mask, dtype=np.float32),
                np.asarray(lines_map, dtype=np.float32))


def make_detector(backend: str = "surrogate", cfg: DetectorConfig | None = None,
                  model_path: str | None = None):
    """Backend factory (the reference's suffix switch, inference.py:124-130,
    made explicit)."""
    if backend == "surrogate":
        return SurrogateDetector(cfg)
    if backend == "torch":
        return TorchDetector(model_path, cfg)
    if backend == "onnx":
        return OnnxDetector(model_path, cfg)
    raise ValueError(f"unknown detector backend {backend!r}")

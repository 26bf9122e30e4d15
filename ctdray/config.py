"""Pipeline configuration.

All thresholds mirror the reference defaults (cited per field); they are the
user-extension surface the reference exposes as constructor args / constants
(reference: inference.py:120,139,159; utils/db_utils.py:33; utils/textblock.py:429-430).
"""
from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class DetectorConfig:
    """Detection + postprocess thresholds (reference: inference.py:120-139)."""

    input_size: int = 1024          # letterbox target (inference.py:24,120)
    stride: int = 64                # letterbox stride (inference.py:75)
    conf_thresh: float = 0.4        # YOLO conf (inference.py:120)
    nms_thresh: float = 0.35        # NMS IoU (inference.py:120)
    mask_thresh: float = 0.3        # mask binarize (inference.py:120; unused on the span path)
    seg_thresh: float = 0.3         # DB shrink-map binarize (inference.py:139)
    box_thresh: float = 0.6         # DB box score filter (inference.py:159)
    unclip_ratio: float = 1.5       # DB unclip (utils/db_utils.py:33)
    max_candidates: int = 1000      # DB contour cap (utils/db_utils.py:33)
    max_det: int = 300              # NMS output cap (utils/yolov5_utils.py:145)
    bbox_score_thresh: float = 0.4  # line→block assignment (utils/textblock.py:429)
    mask_score_thresh: float = 0.1  # scattered-line mask density (utils/textblock.py:430)


@dataclass(frozen=True)
class PipelineConfig:
    """End-to-end extraction pipeline knobs (Ray-side sizing is ours, not the
    reference's — the reference is a sequential batch=1 loop, inference.py:28,78)."""

    detector: DetectorConfig = field(default_factory=DetectorConfig)

    # Ray Data sizing.  A 1024² float32 lines_map is ~8 MB; keep detect batches
    # small so batch×concurrency fits a worker heap at 100 TB scale.
    detect_batch_size: int = 8
    detect_concurrency: int | None = None   # None → fixed pool of CPUs-1
    postprocess_batch_size: int = 16
    # 'tasks': stateless map_batches with a per-worker detector cache — warm
    # workers are reused across pipelines, no pool cold-start (the right mode
    # for CPU backends whose state is cheap to build).  'actors': fixed
    # ActorPoolStrategy pool — required for prod GPU weights (load once per
    # actor, add num_gpus via the builder), at the cost of a pool spin-up on
    # every pipeline.
    detect_compute: str = "tasks"
    # Detect-stage layout.  'fused' (default, CPU backends): infer +
    # postprocess in one task, the ~12 MB/page model maps never enter the
    # object store.  'split' (prod GPU layout): a DetectInfer actor pool
    # (num_gpus=infer_num_gpus each) emits compact raw tensors
    # (schema.TENSOR_PAGE_SCHEMA) and stateless CPU tasks run
    # NMS/representer/grouping — the layout for clusters where the model
    # runs on accelerators and postprocess must scale on separate CPUs.
    detect_layout: str = "fused"
    infer_num_gpus: float = 0.0     # per infer actor; 0 = CPU infer pool
    infer_concurrency: int | None = None  # None → GPUs/infer_num_gpus, else ~2/3 CPUs
    # GPU micro-batch: pages per infer call.  4 pages ≈ 16 MB of fp16 maps
    # out per call — small enough that batch × concurrency stays well under
    # a worker heap even at 100-TB corpus block sizes.
    infer_batch_size: int = 4
    # Ship split-layout map VALUES as fp16 (compute stays fp32; the codec
    # casts only the stored bytes — tensorcodec module docstring).  Default
    # ON: halves the object-store bytes per page, measured span-identical
    # and within noise of fp32 wall-time on the bench corpus.
    half_maps: bool = True
    # Hybrid splice routing: docs with ≤ this many media spans take the fused
    # no-shuffle path (detect+splice inside one task); denser docs explode to
    # page rows and reunite via groupby(doc_id) so one dense doc can never
    # make a task unbounded.  The groupby then carries only the skew tail.
    dense_media_threshold: int = 32
    docs_batch_size: int = 4                # docs per fused-stage batch
    # Mask-refinement stage knobs (reference REFINEMASK_*, utils/textmask.py:
    # 13-14; consumed by stages/refine.py — the annotation flow at
    # inference.py:35 runs ANNOTATION mode with undetected-region recovery).
    keep_undetected_mask: bool = True       # inference.py:35,142
    refine_mode: str = "annotation"         # 'annotation' | 'inpaint'
    mask_format: str = "png"                # mask sink codec ('png' matches
                                            # the reference's mask-<name>.png,
                                            # inference.py:70; 'pgm' selectable)

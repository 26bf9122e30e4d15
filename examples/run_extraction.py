#!/usr/bin/env python
"""End-to-end example: the engine's equivalent of the reference's
``model2annotations`` driver (inference.py:19-70), run as a resumable Ray
job.

    python examples/run_extraction.py --n-docs 200 --out /tmp/ctdray_demo
    python examples/run_extraction.py --n-docs 200 --out /tmp/ctdray_demo  # resumes: all chunks skipped

Writes: partitioned Parquet output documents (detected text_line spans
spliced into each doc's span array), a per-chunk manifest with lineage +
detection metrics, and optionally the refined-mask table (--masks).
In production, point --input at a Lance dataset of interleaved documents and
select the torch/ONNX detector backend with --backend.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None,
                    help="dir of parquet doc fragments (default: synthesize)")
    ap.add_argument("--n-docs", type=int, default=200)
    ap.add_argument("--out", default="/tmp/ctdray_demo")
    ap.add_argument("--backend", default="surrogate",
                    choices=["surrogate", "torch", "onnx"])
    ap.add_argument("--masks", action="store_true",
                    help="also write the refined-mask table")
    ap.add_argument("--annotations", action="store_true",
                    help="also write the annotation table (block structs + "
                         "mask per page; resume refinement from it with "
                         "pipelines.extract.refine_from_annotations)")
    ap.add_argument("--layout", default="fused", choices=["fused", "split"],
                    help="detect layout: fused (CPU default) or split "
                         "(prod GPU shape: infer pool + stateless "
                         "postprocess)")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # Under `ray job submit` the supervisor exports RAY_ADDRESS for the
        # running cluster — connect to it (num_cpus is a local-mode knob
        # only).  Standalone, default to a fresh local instance.
        addr = os.environ.get("RAY_ADDRESS", "local")
        if addr in ("local", ""):
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False)
        else:
            ray.init(address=addr)

    from ctdray.config import PipelineConfig
    from ctdray.fixtures import write_corpus
    from ctdray.state.manifest import read_manifest, run_checkpointed

    in_dir = args.input
    if in_dir is None:
        in_dir = os.path.join(args.out, "input")
        if not os.path.isdir(in_dir):
            write_corpus(in_dir, args.n_docs)
            print(f"synthesized {args.n_docs} docs -> {in_dir}")

    cfg = PipelineConfig(detect_layout=args.layout)
    summary = run_checkpointed(in_dir, args.out, cfg, backend=args.backend)
    print("run summary:", json.dumps(summary))
    for rec in read_manifest(args.out):
        print(f"  chunk {rec['chunk']}: {rec['n_pages']} pages, "
              f"{rec['n_detected_spans']} detected spans, "
              f"{rec['pages_per_sec']} pages/s, "
              f"hist={rec['detected_per_page_hist']}")

    if args.masks:
        from ctdray.pipelines.extract import build_refined_masks
        from ctdray.sources.docs import read_docs

        masks_dir = os.path.join(args.out, "masks")
        build_refined_masks(read_docs(in_dir), cfg,
                            backend=args.backend).write_parquet(masks_dir)
        print(f"refined masks -> {masks_dir}")

    if args.annotations:
        from ctdray.pipelines.extract import build_annotations
        from ctdray.sources.docs import read_docs

        ann_dir = os.path.join(args.out, "annotations")
        build_annotations(read_docs(in_dir), cfg,
                          backend=args.backend).write_parquet(ann_dir)
        print(f"annotations -> {ann_dir}")

    ray.shutdown()


if __name__ == "__main__":
    main()

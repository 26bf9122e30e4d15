#!/usr/bin/env python
"""Measure the SPLIT detect layout against the fused default on the bench
corpus (same job, same session, back-to-back) — documents the CPU-only cost
of the prod-GPU layout: the split pipeline ships ~4-8 MB of maps per page
through the object store, which a GPU cluster pays for postprocess
independence, while the fused layout never serializes them.

Prints ONE JSON line with both wall times and page throughputs.
Usage: python tools/split_layout_bench.py [--fp32] (env: GRAFT_SF_DIR, RAY_GRAFT_CPUS)
fp16 map values are the measured default (config.half_maps); --fp32 ships fp32.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    half = "--fp32" not in sys.argv

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    import pyarrow.compute as pc

    from ctdray.config import PipelineConfig
    from ctdray.pipelines.extract import build_flat_spans
    from ctdray.pipelines.interleave import read_interleaved_docs

    def run(cfg) -> tuple[float, int]:
        t0 = time.perf_counter()
        n_pages = 0
        ds = build_flat_spans(read_interleaved_docs(sf_dir), cfg)
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
            n_pages += pc.sum(pc.cast(pc.equal(b.column("kind"), "media"),
                                      "int64")).as_py() or 0
        return time.perf_counter() - t0, n_pages

    # warmup (worker spin-up) then best-of-2 per layout, interleaved to
    # share host conditions
    warm = build_flat_spans(read_interleaved_docs(sf_dir).limit(64))
    sum(b.num_rows for b in warm.iter_batches(batch_format="pyarrow"))
    fused_cfg = PipelineConfig()
    split_cfg = PipelineConfig(detect_layout="split", half_maps=half)
    fused_s = split_s = None
    pages = 0
    for _ in range(2):
        s, pages = run(fused_cfg)
        fused_s = s if fused_s is None else min(fused_s, s)
        s, _ = run(split_cfg)
        split_s = s if split_s is None else min(split_s, s)
    print(json.dumps({
        "metric": "split vs fused detect layout (CPU surrogate)",
        "sf": sf_dir, "num_cpus": num_cpus, "half_maps": half,
        "n_pages": pages,
        "fused_sec": round(fused_s, 3),
        "split_sec": round(split_s, 3),
        "fused_pages_per_sec": round(pages / fused_s, 1),
        "split_pages_per_sec": round(pages / split_s, 1),
        "split_overhead_ratio": round(split_s / fused_s, 3),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()

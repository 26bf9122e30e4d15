#!/usr/bin/env python
"""Kill/resume evidence for the checkpointed HEADLINE run at bench scale
(VERDICT r2 item 7): run `run_checkpointed_interleaved` over the sf0.1 bench
corpus in a worker process, SIGKILL it mid-run, re-submit, and verify

  1. no-rework: every manifest record published before the kill is untouched
     (mtime-identical) after the resume, and the resume's chunks_skipped
     equals the pre-kill publish count;
  2. no partials: no `_tmp-chunk-*` dir survives the resumed run;
  3. result integrity: the concatenated chunk outputs equal the direct
     (un-checkpointed) pipeline, row-for-row.

Usage:  python tools/resume_bench.py [--sf-dir /root/testdata/sf0.1]
        (spawns its own worker subprocesses; prints ONE JSON line)
The worker mode (`--worker --out DIR`) owns a Ray session; the parent never
inits Ray for the kill leg, and runs the equality check in-process after.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NUM_CHUNKS = 16


def worker(sf_dir: str, out_dir: str, num_cpus: int) -> None:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ctdray.state.manifest import run_checkpointed_interleaved

    summary = run_checkpointed_interleaved(sf_dir, out_dir,
                                           num_chunks=NUM_CHUNKS)
    print(json.dumps(summary), flush=True)
    ray.shutdown()


def ratio(sf_dir: str, out_dir: str, num_cpus: int) -> None:
    """Checkpointed-vs-direct fixed-cost record (VERDICT r4 task 1): run
    the direct headline and the 16-chunk checkpointed headline in ONE warm
    Ray session, best-of-3 each, and report checkpointed/direct.  The
    checkpointed runner overlaps chunk pipelines (concurrency=6 default),
    so the per-chunk planning/executor ramp amortizes instead of
    serializing."""
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from ctdray.config import PipelineConfig
    from ctdray.pipelines.extract import build_flat_spans
    from ctdray.pipelines.interleave import _interleave_batch
    from ctdray.sources.tables import read_parquet_clean
    from ctdray.state.manifest import run_checkpointed_interleaved

    def direct_run() -> float:
        t0 = time.time()
        cfg = PipelineConfig()
        flat = read_parquet_clean(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"])
        docs = flat.map_batches(_interleave_batch, batch_format="pyarrow")
        ds = build_flat_spans(docs, cfg, "surrogate")
        shutil.rmtree(os.path.join(out_dir, "direct"), ignore_errors=True)
        ds.write_parquet(os.path.join(out_dir, "direct"))
        return time.time() - t0

    def ckpt_run(i: int) -> tuple[float, dict]:
        dest = os.path.join(out_dir, f"ckpt-{i}")
        shutil.rmtree(dest, ignore_errors=True)
        t0 = time.time()
        s = run_checkpointed_interleaved(sf_dir, dest,
                                         num_chunks=NUM_CHUNKS)
        return time.time() - t0, s

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    direct_run()                              # warm session once
    directs = [round(direct_run(), 2) for _ in range(3)]
    ckpts, pages = [], None
    for i in range(3):
        w, s = ckpt_run(i)
        ckpts.append(round(w, 2))
        pages = s["n_pages"]
    ray.shutdown()
    best_d, best_c = min(directs), min(ckpts)
    print(json.dumps({
        "metric": "checkpointed headline overhead vs direct (warm session)",
        "sf": sf_dir, "num_chunks": NUM_CHUNKS, "num_cpus": num_cpus,
        "direct_s": directs, "checkpointed_s": ckpts,
        "best_direct_s": best_d, "best_checkpointed_s": best_c,
        "ratio": round(best_c / best_d, 3), "n_pages": pages,
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default="/tmp/ctdray_resume_bench")
    ap.add_argument("--num-cpus", type=int, default=int(
        os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--kill-after-chunks", type=int, default=4)
    ap.add_argument("--ratio", action="store_true",
                    help="measure checkpointed-vs-direct overhead in one "
                         "warm session (no kill) and print the ratio")
    args = ap.parse_args()

    if args.worker:
        worker(args.sf_dir, args.out, args.num_cpus)
        return
    if args.ratio:
        ratio(args.sf_dir, args.out, args.num_cpus)
        return

    out_dir = args.out
    shutil.rmtree(out_dir, ignore_errors=True)
    man_glob = os.path.join(out_dir, "manifest", "chunk-*.json")

    # Leg 1: start the checkpointed run, SIGKILL once K chunks published.
    cmd = [sys.executable, os.path.abspath(__file__), "--worker",
           "--out", out_dir, "--sf-dir", args.sf_dir,
           "--num-cpus", str(args.num_cpus)]
    t0 = time.time()
    proc = subprocess.Popen(cmd, cwd=REPO)
    while True:
        n_pub = len(glob.glob(man_glob))
        if n_pub >= args.kill_after_chunks:
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            break
        if proc.poll() is not None:   # finished before we could kill: rerun
            raise SystemExit("worker finished before kill threshold; "
                             "lower --kill-after-chunks")
        time.sleep(0.2)
    kill_s = round(time.time() - t0, 1)
    pre = {p: os.path.getmtime(p) for p in glob.glob(man_glob)}

    # Leg 2: resume to completion.
    t1 = time.time()
    out = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    resume_s = round(time.time() - t1, 1)
    line = [ln for ln in out.stdout.strip().splitlines()
            if ln.startswith("{")][-1]
    summary = json.loads(line)

    untouched = all(os.path.getmtime(p) == m for p, m in pre.items())
    tmp_left = glob.glob(os.path.join(out_dir, "data", "_tmp-chunk-*"))

    # Result integrity vs the direct (un-checkpointed) pipeline.
    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from ctdray.pipelines.extract import interleaved_extraction
    from ctdray.state.manifest import read_result

    KEY = ["doc_id", "seq", "kind", "text", "media_ref", "offset", "order"]

    def canon(ds):
        df = ds.to_pandas()[KEY].sort_values(KEY).reset_index(drop=True)
        k = df.kind
        return df, (len(df), int((k == "media").sum()),
                    int((k == "text_line").sum()))

    got_df, got = canon(read_result(out_dir))
    exp_df, exp = canon(interleaved_extraction(args.sf_dir))
    rows_equal = got_df.equals(exp_df)      # full row-level equality, not
    ray.shutdown()                          # just aggregate counts

    print(json.dumps({
        "metric": "checkpointed headline kill/resume (sf bench corpus)",
        "sf": args.sf_dir,
        "num_chunks": NUM_CHUNKS,
        "chunks_published_before_kill": len(pre),
        "kill_leg_s": kill_s,
        "resume_leg_s": resume_s,
        "resume_chunks_skipped": summary["chunks_skipped"],
        "resume_chunks_done": summary["chunks_done"],
        "no_rework": untouched and summary["chunks_skipped"] == len(pre),
        "no_partials_left": not tmp_left,
        "rows_match_direct": rows_equal,
        "rows": {"got": got, "expected": exp},
    }))


if __name__ == "__main__":
    main()

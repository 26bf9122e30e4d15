#!/usr/bin/env python
"""Two-node-shaped scaling datapoint (VERDICT r4 task 8).

The sandbox is one host, so a real multi-node cluster is impossible — but
Ray's node boundary is the RAYLET, not the machine.  This tool stands up
TWO raylets (``ray start --head`` + a second ``ray start --address``) so
each has its own plasma object store, then runs the SAME headline job on

  1 node  x 16 CPUs   vs   2 nodes x 16 CPUs

in fresh driver processes, reporting both throughputs and the 2x-resource
scaling efficiency.  On the two-raylet cluster every shuffle block that
lands on the other node crosses a real process/plasma boundary through
the object manager (loopback TCP) — the cost a physical cluster pays,
minus the NIC.  A shuffle probe quantifies it: the pipeline's
groupby(doc_id) exchange is stamped with the executing node id on the map
and reduce sides and the tool reports what fraction of rows hopped nodes.

WARNING: this tool calls ``ray stop --force`` (kills any running local
Ray processes).  Run it alone, never concurrently with bench.py/pytest.

Usage: python tools/twonode_bench.py [--sf-dir DIR] [--cpus-per-node 16]
Prints ONE JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ADDR = "127.0.0.1:6379"

_LEG = r"""
import sys, time, shutil, json
sys.path.insert(0, {repo!r})
import ray
ray.init(address={addr!r}, logging_level="ERROR")
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False
from ctdray.config import PipelineConfig
from ctdray.pipelines.extract import build_flat_spans
from ctdray.pipelines.interleave import _interleave_batch
from ctdray.sources.tables import read_parquet_clean

nodes = [n for n in ray.nodes() if n["Alive"]]

def run():
    cfg = PipelineConfig()
    flat = read_parquet_clean({doc_path!r}, columns=["doc_id", "text"])
    docs = flat.map_batches(_interleave_batch, batch_format="pyarrow")
    ds = build_flat_spans(docs, cfg, "surrogate")
    shutil.rmtree("/tmp/ctd_twonode_out", ignore_errors=True)
    ds.write_parquet("/tmp/ctd_twonode_out")

walls = []
for i in range({reps}):
    t0 = time.time(); run(); walls.append(round(time.time() - t0, 2))

probe = None
if len(nodes) > 1:
    import pyarrow as pa
    def stamp_map(b):
        nid = ray.get_runtime_context().get_node_id()[:8]
        return b.append_column("map_node", pa.array([nid] * len(b)))
    def stamp_red(g):
        nid = ray.get_runtime_context().get_node_id()[:8]
        return g.append_column("reduce_node", pa.array([nid] * len(g)))
    docs = read_parquet_clean({doc_path!r}, columns=["doc_id", "text"])
    t = (docs.map_batches(stamp_map, batch_format="pyarrow")
             .groupby("doc_id").map_groups(stamp_red, batch_format="pyarrow")
             .select_columns(["map_node", "reduce_node"])).to_pandas()
    probe = {{"rows": len(t),
              "cross_node_rows": int((t.map_node != t.reduce_node).sum())}}

print("LEG " + json.dumps({{
    "n_nodes": len(nodes), "walls_s": walls,
    "best_s": min(walls[1:] or walls),
    "shuffle_probe": probe}}))
ray.shutdown()
"""


def _sh(cmd: str) -> None:
    subprocess.run(cmd, shell=True, check=False,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)


def _leg(sf_dir: str, reps: int) -> dict:
    code = _LEG.format(repo=REPO, addr=ADDR, reps=reps,
                       doc_path=os.path.join(sf_dir, "documents.parquet"))
    out = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                         capture_output=True, text=True, timeout=580)
    for ln in out.stdout.splitlines():
        if ln.startswith("LEG "):
            return json.loads(ln[4:])
    raise SystemExit(f"leg failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus-per-node", type=int, default=16)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()
    c = args.cpus_per_node

    _sh("ray stop --force")
    time.sleep(2)
    _sh(f"ray start --head --num-cpus {c} --port 6379 "
        "--include-dashboard=false --disable-usage-stats")
    time.sleep(2)
    one = _leg(args.sf_dir, args.reps)

    _sh(f"ray start --address={ADDR} --num-cpus {c} --disable-usage-stats")
    time.sleep(3)
    two = _leg(args.sf_dir, args.reps)
    _sh("ray stop --force")

    speedup = one["best_s"] / two["best_s"]
    probe = two["shuffle_probe"] or {}
    print(json.dumps({
        "metric": "two-raylet (two-plasma-store) scaling datapoint",
        "sf": args.sf_dir, "cpus_per_node": c,
        "one_node": one, "two_nodes": two,
        "speedup_2x_resources": round(speedup, 3),
        "efficiency": round(speedup / 2, 3),
        "shuffle_cross_node_fraction": round(
            probe.get("cross_node_rows", 0) / max(1, probe.get("rows", 1)), 3),
    }))


if __name__ == "__main__":
    main()

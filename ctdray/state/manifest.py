"""Checkpoint manifest + idempotent resume.

The reference checkpoints only training (epoch-level optimizer state,
train_db.py:97-106) and its inference loop dies on first error
(inference.py:28).  At 10^12-document scale an extraction run must be
re-submittable: the input is chunked into fixed groups of Parquet/Lance
fragments; each chunk's output is written to its own directory (temp-dir +
atomic rename) and recorded in ``manifest/chunk-*.json`` with lineage
(file list, code+config hash) and detection-count metrics (north_rule).
A re-run (``ray job submit`` of the same driver script) skips every chunk
whose manifest record exists with a matching lineage hash — no duplicated
work, no partial outputs visible.
"""
from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import time
from typing import Optional

import numpy as np

from .. import __version__
from ..config import PipelineConfig


def _lineage_hash(files: list[str], cfg: PipelineConfig, backend: str) -> str:
    payload = json.dumps({
        "engine": __version__,
        "files": [os.path.basename(f) for f in files],
        "cfg": repr(cfg),
        "backend": backend,
    }, sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def _chunks(files: list[str], chunk_size: int) -> list[list[str]]:
    return [files[i:i + chunk_size] for i in range(0, len(files), chunk_size)]


def run_checkpointed(input_dir: str, output_dir: str,
                     cfg: Optional[PipelineConfig] = None,
                     backend: str = "surrogate",
                     chunk_size: int = 4,
                     max_chunks: Optional[int] = None,
                     concurrency: int = 6) -> dict:
    """Run the extraction pipeline over ``input_dir`` chunk-by-chunk with
    resume.  Returns a summary dict (chunks done/skipped, span counts).

    ``max_chunks`` limits how many *pending* chunks run this submit (used by
    the kill/resume test and by budgeted incremental runs).  Pending chunks
    run ``concurrency`` at a time (see run_checkpointed_interleaved — same
    scheme, same unchanged crash semantics).
    """
    import pyarrow.parquet as pq

    from ..pipelines.extract import extraction_pipeline

    cfg = cfg or PipelineConfig()
    files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet fragments under {input_dir}")
    manifest_dir = os.path.join(output_dir, "manifest")
    data_dir = os.path.join(output_dir, "data")
    os.makedirs(manifest_dir, exist_ok=True)
    os.makedirs(data_dir, exist_ok=True)
    _check_plan(manifest_dir, {
        "kind": "fragments", "chunk_size": chunk_size,
        "files": [os.path.basename(f) for f in files]})

    skipped = 0
    pending: list[tuple[int, list[str], str]] = []
    for ci, chunk in enumerate(_chunks(files, chunk_size)):
        lineage = _lineage_hash(chunk, cfg, backend)
        man_path = os.path.join(manifest_dir, f"chunk-{ci:05d}.json")
        if os.path.exists(man_path):
            with open(man_path) as f:
                rec = json.load(f)
            if rec.get("lineage") == lineage:
                skipped += 1
                continue   # finished by a previous submit — idempotent skip
        pending.append((ci, chunk, lineage))
    if max_chunks is not None:
        pending = pending[:max_chunks]

    def _run_chunk(args: tuple[int, list[str], str]) -> dict:
        ci, chunk, lineage = args
        t0 = time.time()
        ds = extraction_pipeline(chunk, cfg, backend)
        out_chunk = _publish_chunk(data_dir, ci, ds)
        # Partition metrics from the written files (metadata-only where
        # possible; span kinds need one column scan of the chunk output).
        n_docs = n_spans = n_detected = n_pages = 0
        per_page_lines: dict[str, int] = {}
        for part in glob.glob(os.path.join(out_chunk, "*.parquet")):
            pf = pq.ParquetFile(part)
            n_docs += pf.metadata.num_rows
            tbl = pq.read_table(part, columns=["spans"])
            import pyarrow.compute as pc

            flat = pc.list_flatten(tbl.column("spans").combine_chunks())
            n_spans += len(flat)
            n_detected += pc.sum(
                pc.cast(pc.equal(flat.field("kind"), "text_line"), "int64")
            ).as_py() or 0
            n_pages += pc.sum(
                pc.cast(pc.equal(flat.field("kind"), "media"), "int64")
            ).as_py() or 0
            # Detected-lines-per-page histogram — the skew signal the
            # size-bucketing / dense-routing decisions are based on (north
            # rule: per-partition detection-count metrics); counts merge
            # across part files before bucketing (_bucket_hist).
            lines = flat.filter(pc.equal(flat.field("kind"), "text_line"))
            for entry in pc.value_counts(lines.field("media_ref")).to_pylist():
                per_page_lines[entry["values"]] = \
                    per_page_lines.get(entry["values"], 0) + entry["counts"]
        page_hist = _bucket_hist(per_page_lines, n_pages)
        rec = {
            "chunk": ci,
            "files": [os.path.basename(f) for f in chunk],
            "lineage": lineage,
            "n_docs": n_docs,
            "n_pages": n_pages,
            "n_spans": n_spans,
            "n_detected_spans": n_detected,
            "detected_per_page_hist": page_hist,
            "wall_s": round(time.time() - t0, 3),
            "pages_per_sec": round(n_pages / max(1e-9, time.time() - t0), 2),
        }
        _write_manifest_record(manifest_dir, ci, rec)
        return rec

    recs = _run_chunks_concurrently(pending, _run_chunk, concurrency)
    return {"chunks_done": len(recs), "chunks_skipped": skipped,
            "n_docs": sum(r["n_docs"] for r in recs),
            "n_spans": sum(r["n_spans"] for r in recs),
            "n_detected_spans": sum(r["n_detected_spans"] for r in recs)}


def _check_plan(manifest_dir: str, plan: dict) -> None:
    """Pin one chunking plan per output dir.  A re-submit with a different
    plan (other chunk count/size, other file list, grown corpus) would
    republish ranges under new chunk indices while STALE chunk dirs from the
    old plan stay on disk — read_result would then silently concatenate
    overlapping data.  First submit records the plan; later submits must
    match it exactly or use a fresh output dir."""
    plan_path = os.path.join(manifest_dir, "plan.json")
    if os.path.exists(plan_path):
        with open(plan_path) as f:
            old = json.load(f)
        if old != plan:
            raise ValueError(
                "output dir holds chunks from a different chunking plan "
                f"({old}); re-submit with the same plan or use a fresh "
                f"output dir (got {plan})")
        return
    tmp = plan_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(plan, f)
    os.replace(tmp, plan_path)


def _bucket_hist(per_page_lines: dict, n_pages: int) -> dict:
    """Detected-lines-per-page histogram (north_rule partition metrics):
    bucketize the per-page line counts; pages with ZERO detected lines are
    the difference against the chunk's page count."""
    hist: dict[str, int] = {}
    for c in per_page_lines.values():
        bucket = ("1-4" if c <= 4 else "5-9" if c <= 9 else
                  "10-19" if c <= 19 else "20+")
        hist[bucket] = hist.get(bucket, 0) + 1
    zero = n_pages - len(per_page_lines)
    if zero > 0:
        hist["0"] = zero
    return dict(sorted(hist.items()))


def _run_chunks_concurrently(pending: list, run_chunk, concurrency: int
                             ) -> list[dict]:
    """Execute pending chunks, a few at a time, inside one Ray session.

    Each chunk is an independent Dataset execution publishing atomically
    (temp-dir + rename + manifest record), so crash semantics are
    unchanged: a kill loses at most the in-flight chunks, which leave
    only ``_tmp`` dirs and no record.  Overlapping the small pipelines
    hides the per-chunk fixed cost (read planning + streaming-executor
    ramp) behind neighbors' useful compute; Ray Data executors share the
    cluster via backpressure.  The FIRST chunk always runs alone — it
    warms every lazy import (fsspec, datasink internals; Python's module
    init is not safe under concurrent first-import) and the per-process
    detector caches.  ``concurrency <= 1`` reproduces sequential
    behavior."""
    if not pending:
        return []
    _warm_lazy_io_imports()
    workers = _effective_workers(len(pending), concurrency)
    if workers <= 1:
        return [run_chunk(a) for a in pending]
    from concurrent.futures import ThreadPoolExecutor

    recs = [run_chunk(pending[0])]
    with ThreadPoolExecutor(max_workers=workers) as ex:
        recs += list(ex.map(run_chunk, pending[1:]))
    return recs


def _effective_workers(n_pending: int, concurrency: int) -> int:
    """Pool width actually used for ``n_pending`` chunks (the first runs
    alone) — also the right divisor for per-chunk read parallelism, so a
    1-chunk resume keeps full read fan-out instead of 1/concurrency."""
    return max(1, min(concurrency, n_pending - 1))


def _warm_lazy_io_imports() -> None:
    """Make Ray Data's per-write lazy import of ``fsspec.implementations
    .http`` race-free before chunks run concurrently.  When aiohttp is
    absent that import FAILS on every write (failed imports aren't
    cached), and two threads re-importing it simultaneously can surface a
    plain ImportError that Ray's ``except ModuleNotFoundError`` misses.
    If the real import fails, register a stub module whose
    ``HTTPFileSystem`` is a never-instantiated class, so every later
    import is a stable sys.modules cache hit and ``isinstance`` checks
    against it are simply False (correct for local/non-HTTP paths)."""
    import sys
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except ImportError:
        import types

        stub = types.ModuleType("fsspec.implementations.http")

        class _NoHTTPFileSystem:        # pragma: no cover - marker only
            pass

        stub.HTTPFileSystem = _NoHTTPFileSystem
        sys.modules["fsspec.implementations.http"] = stub


def _publish_chunk(data_dir: str, ci: int, ds) -> str:
    """write_parquet into a temp dir + atomic rename — a killed run leaves
    only ``_tmp`` dirs and no manifest record, so nothing partial is ever
    visible to readers or to the resume scan."""
    out_chunk = os.path.join(data_dir, f"chunk-{ci:05d}")
    tmp_chunk = os.path.join(data_dir, f"_tmp-chunk-{ci:05d}")
    shutil.rmtree(tmp_chunk, ignore_errors=True)
    ds.write_parquet(tmp_chunk)
    shutil.rmtree(out_chunk, ignore_errors=True)
    os.rename(tmp_chunk, out_chunk)
    return out_chunk


def _write_manifest_record(manifest_dir: str, ci: int, rec: dict) -> None:
    man_path = os.path.join(manifest_dir, f"chunk-{ci:05d}.json")
    tmp_man = man_path + ".tmp"
    with open(tmp_man, "w") as f:
        json.dump(rec, f)
    os.replace(tmp_man, man_path)


def _flat_chunk_metrics(out_chunk: str) -> dict:
    """Partition metrics over a written FLAT-span chunk (north_rule
    detection-count metrics): row/page/detected counts plus the
    detected-lines-per-page histogram, computed from the chunk's own files
    (kind + media_ref columns only).  Per-page counts merge ACROSS part
    files before bucketing — a page whose line rows straddle two parts is
    one page, not two."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    n_rows = n_pages = n_lines = 0
    per_page: dict[str, int] = {}
    for part in glob.glob(os.path.join(out_chunk, "*.parquet")):
        tbl = pq.read_table(part, columns=["kind", "media_ref"])
        kinds = tbl.column("kind")
        n_rows += len(tbl)
        n_pages += pc.sum(pc.cast(pc.equal(kinds, "media"), "int64")).as_py() or 0
        n_lines += pc.sum(pc.cast(pc.equal(kinds, "text_line"), "int64")).as_py() or 0
        lines = tbl.filter(pc.equal(kinds, "text_line"))
        for entry in pc.value_counts(lines.column("media_ref")).to_pylist():
            per_page[entry["values"]] = per_page.get(entry["values"], 0) \
                + entry["counts"]
    return {"n_rows": n_rows, "n_pages": n_pages, "n_detected_spans": n_lines,
            "detected_per_page_hist": _bucket_hist(per_page, n_pages)}


def run_checkpointed_interleaved(sf_dir: str, output_dir: str,
                                 cfg: Optional[PipelineConfig] = None,
                                 backend: str = "surrogate",
                                 num_chunks: int = 16,
                                 max_chunks: Optional[int] = None,
                                 concurrency: int = 6) -> dict:
    """Checkpointed HEADLINE pipeline (interleaved extraction → flat spans,
    the bench.py job) over a bench corpus directory, resumable chunk by
    chunk.

    The corpus is split into ``num_chunks`` contiguous doc_id ranges — the
    partitioned-output shape a 100-TB run needs (one directory per key
    range; a re-submit skips every published range).  Each chunk reads ONLY
    its range via a parquet filter (predicate pushdown prunes fragments /
    row groups at real scale) and runs the full hybrid pipeline with the
    dense-doc routing derived from the same pure function the interleave
    uses (pipelines.interleave.doc_media_count — the stand-in for a stored
    per-doc metadata column).  Output publishing and manifest records are
    atomic (see _publish_chunk), so a SIGKILL at any instant loses at most
    the in-flight chunk.
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..config import PipelineConfig as _PC
    from ..pipelines.extract import build_flat_spans
    from ..pipelines.interleave import _interleave_batch, doc_media_count
    from ..sources.tables import read_parquet_clean

    cfg = cfg or _PC()
    path = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    ids = np.sort(pq.read_table(path, columns=["doc_id"]).column("doc_id")
                  .to_numpy(zero_copy_only=False))   # bounds need sorted ids
    n = len(ids)
    bounds = [int(ids[(n * k) // num_chunks]) for k in range(num_chunks)] + \
        [int(ids.max()) + 1]
    manifest_dir = os.path.join(output_dir, "manifest")
    data_dir = os.path.join(output_dir, "data")
    os.makedirs(manifest_dir, exist_ok=True)
    os.makedirs(data_dir, exist_ok=True)
    _check_plan(manifest_dir, {"kind": "interleaved",
                               "path": os.path.basename(path),
                               "num_chunks": num_chunks, "bounds": bounds})

    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    skipped = 0
    pending: list[tuple[int, int, int, str]] = []
    for ci in range(num_chunks):
        lo, hi = bounds[ci], bounds[ci + 1]
        if lo >= hi:
            continue
        lineage = _lineage_hash([f"{os.path.basename(path)}:{lo}-{hi}"],
                                cfg, backend)
        man_path = os.path.join(manifest_dir, f"chunk-{ci:05d}.json")
        if os.path.exists(man_path):
            with open(man_path) as f:
                rec = json.load(f)
            if rec.get("lineage") == lineage:
                skipped += 1
                continue
        pending.append((ci, lo, hi, lineage))
    if max_chunks is not None:
        pending = pending[:max_chunks]

    import pyarrow.dataset as pads

    read_div = _effective_workers(len(pending), concurrency)

    def _run_chunk(args: tuple[int, int, int, str]) -> dict:
        ci, lo, hi, lineage = args
        t0 = time.time()
        flat = read_parquet_clean(
            path, columns=["doc_id", "text"],
            filter=(pads.field("doc_id") >= lo) & (pads.field("doc_id") < hi),
            override_num_blocks=max(1, min(cpus * 8 // read_div, hi - lo)))
        docs = flat.map_batches(_interleave_batch, batch_format="pyarrow")
        thr = cfg.dense_media_threshold
        dense_ids = [f"doc-{i:08d}" for i in range(lo, hi)
                     if doc_media_count(i) > thr]
        ds = build_flat_spans(docs, cfg, backend, dense_ids=dense_ids)
        out_chunk = _publish_chunk(data_dir, ci, ds)
        rec = {"chunk": ci, "doc_id_range": [lo, hi], "lineage": lineage,
               **_flat_chunk_metrics(out_chunk)}
        rec["wall_s"] = round(time.time() - t0, 3)
        rec["pages_per_sec"] = round(rec["n_pages"] / max(1e-9, rec["wall_s"]), 2)
        _write_manifest_record(manifest_dir, ci, rec)
        return rec

    total = {"n_rows": 0, "n_pages": 0, "n_detected_spans": 0}
    recs = _run_chunks_concurrently(pending, _run_chunk, concurrency)
    for rec in recs:
        for k in total:
            total[k] += rec[k]
    return {"chunks_done": len(recs), "chunks_skipped": skipped, **total}


def read_manifest(output_dir: str) -> list[dict]:
    recs = []
    for p in sorted(glob.glob(os.path.join(output_dir, "manifest", "chunk-*.json"))):
        with open(p) as f:
            recs.append(json.load(f))
    return recs


def read_result(output_dir: str):
    """Dataset over all completed chunk outputs."""
    import ray.data

    dirs = sorted(glob.glob(os.path.join(output_dir, "data", "chunk-*")))
    dirs = [d for d in dirs if not os.path.basename(d).startswith("_tmp")]
    if not dirs:
        raise FileNotFoundError(f"no completed chunks under {output_dir}")
    # read_parquet wants files (or one dir); expand the chunk dirs ourselves.
    files = sorted(f for d in dirs for f in glob.glob(os.path.join(d, "*.parquet")))
    return ray.data.read_parquet(files)

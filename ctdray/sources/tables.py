"""Clean Parquet table reads for the relational/testdata tables.

``read_parquet_clean`` is ``ray.data.read_parquet`` with the file's pandas
metadata stripped from the schema: Ray's streaming executor deduplicates
block schemas by hashing them, and the ``b'pandas'`` metadata blob makes
them unhashable — every read then logs ``Failed to hash the schemas (for
deduplication): unhashable type: 'dict'`` per block
(ray/data/_internal/arrow_ops/transform_pyarrow.py:181).  Passing the
metadata-free (and column-projected) schema keeps executor logs clean and
lets the schema dedup fast-path work.
"""
from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def read_parquet_clean(path: str, columns: list[str] | None = None,
                       **kwargs) -> ray.data.Dataset:
    if os.path.isfile(path):
        _ensure_split_runahead()
    sch = pq.read_schema(path).remove_metadata()
    if columns:
        sch = pa.schema([sch.field(c) for c in columns])
    return ray.data.read_parquet(path, columns=columns, schema=sch, **kwargs)


def _ensure_split_runahead() -> None:
    """Raise the per-task streaming-generator run-ahead when a SINGLE file
    backs the read.

    A one-file source becomes ONE read task whose SplitBlocks output streams
    through the generator buffer (default 2 unconsumed blocks).  Downstream
    dispatch then serializes behind the driver's pull loop — measured ~50 ms
    per block round-trip, i.e. ~20 task starts/sec, which caps a 32-CPU map
    stage at ~22 running tasks (headline extract: 15.6 s vs its 9.6 s compute
    bound).  Letting the read task run ~2 blocks/CPU ahead removes the cap;
    the buffered blocks are column-pruned metadata slices (KBs) held in the
    object store, so the run-ahead is memory-trivial.  Multi-fragment sources
    (the 100 TB layout — thousands of files) emit ~1 block per read task and
    never hit this; the default is left alone for them.  Map stages emitting
    big payloads (split-layout tensor pages) produce ~1 block per task, so
    the raised cap never engages there either.
    """
    ctx = ray.data.DataContext.get_current()
    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    want = min(128, max(32, 2 * cpus))
    # Private DataContext attr (measured on Ray 2.49.2: headline 15.6 s →
    # 11.0 s).  A Ray upgrade may rename it — guard so the pipeline silently
    # keeps the default cap instead of crashing, and log once so the
    # regression is discoverable rather than mysterious.
    attr = "_max_num_blocks_in_streaming_gen_buffer"
    if not hasattr(ctx, attr):  # pragma: no cover - future-Ray fallback
        import logging

        logging.getLogger(__name__).warning(
            "DataContext.%s gone (Ray upgrade?) — single-file read "
            "run-ahead not applied; expect lower dispatch throughput on "
            "one-file sources", attr)
        return
    if getattr(ctx, attr) < want:
        setattr(ctx, attr, want)


def read_csv_table(path: str, schema: pa.Schema | None = None,
                   columns: list[str] | None = None,
                   **kwargs) -> ray.data.Dataset:
    """CSV source: ``ray.data.read_csv`` with an explicit Arrow schema
    (type inference is per-file and can disagree across shards — a 100 TB
    corpus MUST pin types at the read) and column projection pushed into
    the Arrow CSV reader via convert_options.

    The CSV analog of ``read_parquet_clean``; cite: the reference scans
    annotation ``.txt`` sidecars per image (inference.py:33-70) — tabular
    text ingest is part of its source surface."""
    from pyarrow import csv as pacsv
    convert = pacsv.ConvertOptions(
        column_types=schema,
        include_columns=columns or (list(schema.names) if schema else None))
    return ray.data.read_csv(path, convert_options=convert, **kwargs)


def read_jsonl_table(path: str, schema: pa.Schema | None = None,
                     columns: list[str] | None = None,
                     **kwargs) -> ray.data.Dataset:
    """JSON-lines source: ``ray.data.read_json`` (Arrow streaming JSON
    reader — newline-delimited records), explicit schema pinning for
    cross-shard type agreement, column projection applied as a zero-copy
    select after parse (Arrow's JSON reader has no projection pushdown;
    unparsed columns never leave the read task)."""
    ds = ray.data.read_json(path, **kwargs)
    if schema is not None:
        target = pa.schema([schema.field(c) for c in (columns or schema.names)])

        def conform(batch: pa.Table) -> pa.Table:
            cols = [batch.column(f.name).cast(f.type) for f in target]
            return pa.table(dict(zip(target.names, cols)))

        return ds.map_batches(conform, batch_format="pyarrow")
    if columns:
        return ds.select_columns(columns)
    return ds

"""End-to-end extraction pipeline builders (Ray Data, streaming).

Engine equivalent of ``model2annotations`` (inference.py:19-70) — SURVEY.md
§3.1 — with hybrid skew routing:

    read docs ──┬─ [n_media ≤ threshold, ~all docs] fused stage:
                │    decode + detect + splice inside ONE task
                │    (zero shuffles; weights cached per worker/actor)
                └─ [dense tail] explode media spans → decode → detect per page
                     → union with original spans → groupby(doc_id) splice
                     (the single wide op, carrying only the tail)
                → union → nested span-array documents

The dense path bounds task size under skew (a 10k-page document becomes 10k
page rows, not one 10k-page task); the fused path keeps the common case
exchange-free.  Everything is lazy; consume with ``write_parquet`` / ``take``
/ ``iter_batches``.  No stage materializes the corpus.
"""
from __future__ import annotations

from typing import Optional

import ray.data

from ..config import PipelineConfig
from ..stages.decode import DecodeStage
from ..stages.detect import (DetectExtract, DetectInfer, DetectInferDoc,
                             DetectSpliceDoc, detect_extract_task,
                             detect_infer_doc_task, detect_infer_task,
                             detect_splice_doc_task, postprocess_doc_task,
                             postprocess_task)
from ..stages.explode import explode_all_spans, explode_media_spans
from ..stages.splice import splice_groups


def _detect_concurrency(cfg: PipelineConfig):
    """Actor-pool size for the detect stage: explicit from config, else a
    FIXED pool of CPUs-1 actors.  An autoscaling (1, N) pool was measured to
    plateau near 2 actors on this workload (Ray's queue-based upscaler lags a
    fused pipeline whose upstream is cheap), leaving 6 of 8 CPUs idle; the
    detect stage is the whole pipeline's cost, so it gets every core minus
    one for the read/union/shuffle side (SURVEY.md §4 intra-op threads row)."""
    if cfg.detect_concurrency is not None:
        return cfg.detect_concurrency
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4))
    return max(2, cpus - 1)


def _infer_concurrency(cfg: PipelineConfig) -> int:
    """Infer-pool size for the SPLIT layout: explicit from config; else the
    whole GPU fleet when the stage is GPU-resourced (the pool exists to keep
    accelerators saturated), else ~45% of the CPUs — the measured compute
    split of the CPU-surrogate layout (infer+encode ≈ 5.8 ms/page vs
    postprocess ≈ 7.3 ms/page on the bench corpus): the actor pool RESERVES
    its CPUs whether busy or not, so oversizing it starves the stateless
    postprocess tasks that drain the 4-12 MB/page tensor rows and the object
    store backs up behind them."""
    if cfg.infer_concurrency is not None:
        return cfg.infer_concurrency
    import ray

    res = ray.cluster_resources()
    if cfg.infer_num_gpus > 0:
        return max(1, int(res.get("GPU", 0) / cfg.infer_num_gpus))
    cpus = int(res.get("CPU", 4))
    return max(2, (cpus * 9) // 20)


def _infer_pool(cfg: PipelineConfig) -> bool:
    """Whether the split layout's infer stage runs as an ACTOR POOL.  True
    when the stage is GPU-resourced (weights on-device once per actor,
    num_gpus reserved per actor) or explicitly requested
    (``detect_compute='actors'``); otherwise the infer stage runs as
    stateless tasks with the per-process detector cache — it reserves no
    CPUs, pays no pool spin-up, and Ray balances infer and postprocess tasks
    over one pool instead of pinning a fixed CPU split between the legs."""
    return cfg.infer_num_gpus > 0 or cfg.detect_compute == "actors"


def _map_detect_split(pages: ray.data.Dataset, cfg: PipelineConfig,
                      backend: str, output: str) -> ray.data.Dataset:
    """Split (prod GPU) layout: infer pool/tasks → stateless CPU postprocess
    (stages.detect module docstring)."""
    if _infer_pool(cfg):
        remote_args = {"num_gpus": cfg.infer_num_gpus} \
            if cfg.infer_num_gpus > 0 else {"num_cpus": 1}
        tensors = pages.map_batches(
            DetectInfer,
            fn_constructor_kwargs={"cfg": cfg, "backend": backend},
            batch_format="pyarrow",
            batch_size=cfg.infer_batch_size,
            concurrency=_infer_concurrency(cfg),
            **remote_args,
        )
    else:
        tensors = pages.map_batches(
            detect_infer_task,
            fn_kwargs={"cfg": cfg, "backend": backend},
            batch_format="pyarrow",
            batch_size=cfg.infer_batch_size,
        )
    return tensors.map_batches(
        postprocess_task,
        fn_kwargs={"cfg": cfg, "output": output},
        batch_format="pyarrow",
        batch_size=cfg.infer_batch_size,
    )


def _map_detect(pages: ray.data.Dataset, cfg: PipelineConfig, backend: str,
                output: str) -> ray.data.Dataset:
    """Page rows → detected rows under the configured compute mode/layout."""
    if cfg.detect_layout == "split":
        return _map_detect_split(pages, cfg, backend, output)
    if cfg.detect_compute == "actors":
        return pages.map_batches(
            DetectExtract,
            fn_constructor_kwargs={"cfg": cfg, "output": output,
                                   "backend": backend},
            batch_format="pyarrow",
            batch_size=cfg.detect_batch_size,
            concurrency=_detect_concurrency(cfg),
            num_cpus=1,
        )
    return pages.map_batches(
        detect_extract_task,
        fn_kwargs={"cfg": cfg, "output": output, "backend": backend},
        batch_format="pyarrow",
        batch_size=cfg.detect_batch_size,
    )


def _map_detect_splice(normal: ray.data.Dataset, cfg: PipelineConfig,
                       backend: str) -> ray.data.Dataset:
    """Doc rows → spliced out-docs under the configured compute mode."""
    if cfg.detect_compute == "actors":
        return normal.map_batches(
            DetectSpliceDoc,
            fn_constructor_kwargs={"cfg": cfg, "backend": backend},
            batch_format="pyarrow",
            batch_size=cfg.docs_batch_size,
            concurrency=_detect_concurrency(cfg),
            num_cpus=1,
        )
    return normal.map_batches(
        detect_splice_doc_task,
        fn_kwargs={"cfg": cfg, "backend": backend},
        batch_format="pyarrow",
        batch_size=cfg.docs_batch_size,
    )


def build_detected_spans(docs: ray.data.Dataset,
                         cfg: Optional[PipelineConfig] = None,
                         backend: str = "surrogate",
                         span_stages: Optional[list] = None
                         ) -> ray.data.Dataset:
    """docs → detected text_line span rows (pre-splice,
    schema.DETECTED_SPAN_SCHEMA).

    ``span_stages``: user-supplied ``map_batches`` UDFs applied IN ORDER to
    the detected span rows — the engine's explicit version of the
    reference's implicit extension points (SURVEY.md §2.10; e.g. an OCR
    stage rewriting ``text`` from the page via the O12 rectify hook).  Each
    stage is ``pa.Table → pa.Table`` over DETECTED_SPAN_SCHEMA rows and must
    preserve ``doc_id``/``offset`` (they address the splice position);
    rewriting ``text``/``order`` and dropping rows are fine."""
    cfg = cfg or PipelineConfig()
    pages = docs.map_batches(explode_media_spans, batch_format="pyarrow")
    pages = pages.map_batches(DecodeStage(keep_pixels=False),
                              batch_format="pyarrow",
                              batch_size=cfg.postprocess_batch_size)
    detected = _map_detect(pages, cfg, backend, output="spans")
    for stage in (span_stages or ()):
        detected = detected.map_batches(stage, batch_format="pyarrow")
    return detected


def build_blocks(docs: ray.data.Dataset,
                 cfg: Optional[PipelineConfig] = None,
                 backend: str = "surrogate") -> ray.data.Dataset:
    """docs → TextBlock struct rows (schema.BLOCK_SCHEMA) — the engine's
    equivalent of the reference's JSON block sink (inference.py:66-68)."""
    cfg = cfg or PipelineConfig()
    pages = docs.map_batches(explode_media_spans, batch_format="pyarrow")
    pages = pages.map_batches(DecodeStage(keep_pixels=False),
                              batch_format="pyarrow",
                              batch_size=cfg.postprocess_batch_size)
    return _map_detect(pages, cfg, backend, output="blocks")


def _media_span_counts(batch):
    """Vectorized per-doc media-span count (Arrow kernels, no row loop)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    spans = batch.column("spans").combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    is_media = pc.equal(flat.field("kind"), "media").to_numpy(zero_copy_only=False)
    counts = np.zeros(len(batch), dtype=np.int64)
    np.add.at(counts, parents, is_media.astype(np.int64))
    return counts


def _make_density_filter(threshold: int, dense: bool):
    def fn(batch):
        import pyarrow as pa

        if "n_media" in batch.column_names:   # precomputed by the reader
            counts = batch.column("n_media").to_numpy(zero_copy_only=False)
            batch = batch.drop_columns(["n_media"])
        else:
            counts = _media_span_counts(batch)
        mask = counts > threshold if dense else counts <= threshold
        return batch.filter(pa.array(mask))

    return fn


def _tune_data_context() -> None:
    """Disable Ray Data's per-operator resource reservation for this session.

    Measured on this workload: with the hybrid DAG (fused map + union +
    flatten) the reservation allocator caps the dominant detect stage at
    ~3 of 8 CPUs on a small cluster (139s vs 74s for the identical job),
    while on 32 CPUs it is neutral.  The reservation exists to protect
    multi-operator pipelines with large blocks from memory thrash; this
    engine already bounds memory by construction (small blocks, fused
    stages, compact rows), so the global cap only starves the hot stage.
    """
    import ray.data

    ray.data.DataContext.get_current().op_resource_reservation_enabled = False


def _dense_doc_ids(docs: ray.data.Dataset, thr: int,
                   dense_keys: Optional[ray.data.Dataset],
                   limit: int = 1_000_000):
    """Collect the dense-doc id set from a key scan.

    ``dense_keys`` (doc_id + n_media only — e.g.
    interleave.read_interleaved_doc_keys, or a stored metadata column at
    real scale) makes this a near-free scan; without it the keys are
    projected from ``docs`` itself (one full pass, no pixels decoded).
    Returns a python list (tiny by construction: the dense tail is the
    pathological skew fraction), or ``None`` if it exceeds ``limit`` —
    the caller then falls back to predicate routing."""
    src = dense_keys if dense_keys is not None else docs

    def keys(batch):
        import numpy as np
        import pyarrow as pa

        if "n_media" in batch.column_names:
            counts = batch.column("n_media").to_numpy(zero_copy_only=False)
        else:
            counts = _media_span_counts(batch)
        return pa.table({"doc_id": batch.column("doc_id")}).filter(
            pa.array(counts > thr))

    ids: list = []
    ks = src.map_batches(keys, batch_format="pyarrow")
    for b in ks.iter_batches(batch_format="pyarrow"):
        ids.extend(b.column("doc_id").to_pylist())
        if len(ids) > limit:        # cap exceeded → predicate routing (tested)
            return None
    return ids


def _media_page_rows(batch):
    """Span rows → page rows (media spans only, PAGE_SCHEMA columns)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    sel = batch.filter(pc.equal(batch.column("kind"), "media"))
    return pa.table({"doc_id": sel.column("doc_id"),
                     "media_offset": sel.column("offset"),
                     "media_ref": sel.column("media_ref")})


def _split_doc_path(docs: ray.data.Dataset, cfg: PipelineConfig,
                    backend: str) -> ray.data.Dataset:
    """SPLIT-layout zero-shuffle path: doc rows → DetectInferDoc pool →
    stateless postprocess+splice tasks (stages/detect.py doc-carrying pair).
    Documents never leave their task between infer and splice, so like the
    fused path nothing crosses an exchange — only the codec'd maps cross the
    infer→postprocess OBJECT-STORE boundary (that boundary is the point of
    the layout: the infer pool holds the GPUs, postprocess scales on CPUs)."""
    if _infer_pool(cfg):
        remote_args = {"num_gpus": cfg.infer_num_gpus} \
            if cfg.infer_num_gpus > 0 else {"num_cpus": 1}
        tensor_docs = docs.map_batches(
            DetectInferDoc,
            fn_constructor_kwargs={"cfg": cfg, "backend": backend},
            batch_format="pyarrow",
            batch_size=cfg.docs_batch_size,
            concurrency=_infer_concurrency(cfg),
            **remote_args,
        )
    else:
        tensor_docs = docs.map_batches(
            detect_infer_doc_task,
            fn_kwargs={"cfg": cfg, "backend": backend},
            batch_format="pyarrow",
            batch_size=cfg.docs_batch_size,
        )
    return tensor_docs.map_batches(
        postprocess_doc_task,
        fn_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.docs_batch_size,
    )


def _split_out_docs(docs: ray.data.Dataset, cfg: PipelineConfig,
                    backend: str,
                    dense_keys: Optional[ray.data.Dataset] = None,
                    dense_ids: Optional[list] = None) -> ray.data.Dataset:
    """SPLIT-layout document assembly with the same hybrid skew routing as
    the fused pipeline (build_out_docs): typical docs take the doc-carrying
    zero-shuffle path (:func:`_split_doc_path`); only the dense tail explodes
    to page rows and reunites through the ``groupby(doc_id)`` splice.  That
    residual shuffle carries only compact span rows (text + serialized quads;
    pixels and tensors never reach it), and only for the pathological
    fraction of the corpus."""
    thr = cfg.dense_media_threshold
    if dense_ids is None:
        dense_ids = _dense_doc_ids(docs, thr, dense_keys)
    if dense_ids is not None and not dense_ids:
        # Common case: no dense tail → ONE scan, zero shuffles.
        return _split_doc_path(docs, cfg, backend)

    from ..functions.joins import broadcast_semi_join

    if dense_ids is not None:
        normal = broadcast_semi_join(docs, dense_ids, "doc_id", anti=True)
        dense = broadcast_semi_join(docs, dense_ids, "doc_id")
    else:   # id-cap exceeded → complementary-predicate full scans (tested)
        normal = docs.map_batches(_make_density_filter(thr, dense=False),
                                  batch_format="pyarrow")
        dense = docs.map_batches(_make_density_filter(thr, dense=True),
                                 batch_format="pyarrow")

    doc_out = _split_doc_path(normal, cfg, backend)

    # Dense tail: page-level split stages + the groupby splice.  Materialized
    # for the same reasons as the fused hybrid's tail (bounded by
    # construction; keeps the lazy tail operators from starving the main
    # pool under per-operator reservation).
    cpus = int(ray.cluster_resources().get("CPU", 8))
    dense_spans = (dense.map_batches(explode_all_spans, batch_format="pyarrow")
                        .repartition(max(4, cpus // 4))
                        .materialize())
    pages = dense_spans.map_batches(_media_page_rows, batch_format="pyarrow")
    pages = pages.map_batches(DecodeStage(keep_pixels=False),
                              batch_format="pyarrow",
                              batch_size=cfg.postprocess_batch_size)
    detected = _map_detect_split(pages, cfg, backend, output="spans")
    dense_out = (dense_spans.union(detected)
                 .groupby("doc_id")
                 .map_groups(splice_groups, batch_format="pyarrow")
                 .materialize())
    return doc_out.union(dense_out)


def build_out_docs(docs: ray.data.Dataset,
                   cfg: Optional[PipelineConfig] = None,
                   backend: str = "surrogate",
                   dense_keys: Optional[ray.data.Dataset] = None,
                   dense_ids: Optional[list] = None,
                   span_stages: Optional[list] = None) -> ray.data.Dataset:
    """Full pipeline → nested output documents (schema.OUT_DOC_SCHEMA): the
    input span array re-emitted with detected spans spliced in.

    Hybrid routing (skew handling, SURVEY.md §4): typical docs (media spans ≤
    cfg.dense_media_threshold) run the FUSED path — decode+detect+splice
    inside one actor task, zero shuffles end-to-end.  The dense tail explodes
    to page rows, detects per page, and reunites via ``groupby(doc_id)`` —
    the shuffle exists but carries only the pathological fraction of the
    corpus, so its barrier no longer gates the whole pipeline.

    Routing is decided by ONE cheap key scan (``dense_keys``: doc_id +
    n_media only — see _dense_doc_ids) instead of running two full
    read+interleave passes with complementary predicates: the common case
    (no dense docs) then runs exactly one full scan with no filter at all,
    and a non-empty tail routes by broadcast id-set membership (at real
    scale the tail fetch is an indexed take on the Lance key column)."""
    _tune_data_context()
    cfg = cfg or PipelineConfig()
    if span_stages:
        # User span stages need the detected spans AS ROWS, which the fused
        # doc-level task never materializes — so the whole corpus takes the
        # explode layout and the splice becomes the wide step (the same
        # machinery the dense tail always uses; a custom stage — OCR, span
        # filtering, re-scoring — dominates the pipeline's cost anyway, and
        # the shuffle payload is still compact span rows, never pixels).
        originals = docs.map_batches(explode_all_spans,
                                     batch_format="pyarrow")
        detected = build_detected_spans(docs, cfg, backend,
                                        span_stages=span_stages)
        return originals.union(detected).groupby("doc_id") \
            .map_groups(splice_groups, batch_format="pyarrow")
    if cfg.detect_layout == "split":
        return _split_out_docs(docs, cfg, backend, dense_keys=dense_keys,
                               dense_ids=dense_ids)
    thr = cfg.dense_media_threshold

    if dense_ids is None:
        dense_ids = _dense_doc_ids(docs, thr, dense_keys)
    if dense_ids is not None and not dense_ids:
        # Common case: no dense tail → ONE unfiltered fused scan, no union.
        return _map_detect_splice(docs, cfg, backend)

    if dense_ids is None:   # id-cap exceeded → complementary-predicate scans (tested)
        normal = docs.map_batches(_make_density_filter(thr, dense=False),
                                  batch_format="pyarrow")
        dense = docs.map_batches(_make_density_filter(thr, dense=True),
                                 batch_format="pyarrow")
    else:
        from ..functions.joins import broadcast_semi_join

        normal = broadcast_semi_join(docs, dense_ids, "doc_id", anti=True)
        dense = broadcast_semi_join(docs, dense_ids, "doc_id")

    fused = _map_detect_splice(normal, cfg, backend)

    # The tail's span rows are materialized ONCE: it is a bounded, vanishing
    # fraction of the corpus by construction, and every Ray Data consumer of
    # a lazy dataset re-executes its whole upstream chain — without this the
    # originals and pages branches would each re-run read+interleave+filter
    # over the full corpus, and the splice sort (a barrier) could not start
    # until the slower of those duplicate scans finished.
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    dense_spans = (dense.map_batches(explode_all_spans, batch_format="pyarrow")
                        .repartition(max(4, cpus // 4))
                        .materialize())

    media_rows = _media_page_rows

    # Stateless tasks, not a second actor pool: the tail reserves no CPUs
    # (two competing pools can deadlock a small cluster) and an empty tail
    # costs nothing; the per-worker detector cache keeps setup amortized.
    pages = dense_spans.map_batches(media_rows, batch_format="pyarrow")
    pages = pages.map_batches(DecodeStage(keep_pixels=False),
                              batch_format="pyarrow",
                              batch_size=cfg.postprocess_batch_size)
    detected = pages.map_batches(
        detect_extract_task,
        fn_kwargs={"cfg": cfg, "output": "spans", "backend": backend},
        batch_format="pyarrow",
        batch_size=cfg.detect_batch_size,
    )
    all_spans = dense_spans.union(detected)
    dense_out = all_spans.groupby("doc_id").map_groups(splice_groups,
                                                       batch_format="pyarrow")
    # Materialize the tail's OUTPUT too: it is small by construction, and
    # keeping its detect/sort/splice operators lazy inside the main DAG
    # makes Ray Data's per-operator resource reservation starve the fused
    # stage (measured 2.9/8 CPUs busy on an 8-CPU cluster with the tail
    # operators idle-reserving the rest).  As a pre-computed block list it
    # costs the streaming executor nothing.
    dense_out = dense_out.materialize()
    return fused.union(dense_out)


def build_refined_masks(docs: ray.data.Dataset,
                        cfg: Optional[PipelineConfig] = None,
                        backend: str = "surrogate") -> ray.data.Dataset:
    """docs → refined-mask rows (schema.MASK_SCHEMA) — the engine's
    mask-<name>.png sink (inference.py:70; K1-K5 SURVEY.md §2.6)."""
    from ..stages.refine import refine_masks_task

    cfg = cfg or PipelineConfig()
    pages = docs.map_batches(explode_media_spans, batch_format="pyarrow")
    return pages.map_batches(
        refine_masks_task,
        fn_kwargs={"cfg": cfg, "backend": backend},
        batch_format="pyarrow",
        batch_size=cfg.detect_batch_size,
    )


def build_annotations(docs: ray.data.Dataset,
                      cfg: Optional[PipelineConfig] = None,
                      backend: str = "surrogate") -> ray.data.Dataset:
    """docs → per-page annotation rows (schema.ANNOTATION_SCHEMA): block
    structs + saved mask side by side — the save half of the reference's
    annotation round trip (model2annotations' per-image JSON + mask png,
    inference.py:61-70)."""
    from ..stages.refine import annotate_pages_task

    cfg = cfg or PipelineConfig()
    pages = docs.map_batches(explode_media_spans, batch_format="pyarrow")
    return pages.map_batches(
        annotate_pages_task,
        fn_kwargs={"cfg": cfg, "backend": backend},
        batch_format="pyarrow",
        batch_size=cfg.detect_batch_size,
    )


def refine_from_annotations(annotations: ray.data.Dataset,
                            cfg: Optional[PipelineConfig] = None
                            ) -> ray.data.Dataset:
    """Annotation rows → refined-mask rows WITHOUT a detector — the resume
    half of the round trip (traverse_by_dict, inference.py:180-200;
    SURVEY.md §3.2).  A saved annotation table is sufficient to re-run
    K1-K5 refinement at full scale: no weights load, no model forward, so
    the stage is stateless tasks with no actor pool."""
    from ..stages.refine import refine_from_annotations_task

    cfg = cfg or PipelineConfig()
    return annotations.map_batches(
        refine_from_annotations_task,
        fn_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.detect_batch_size,
    )


def build_flat_spans(docs: ray.data.Dataset,
                     cfg: Optional[PipelineConfig] = None,
                     backend: str = "surrogate",
                     dense_keys: Optional[ray.data.Dataset] = None,
                     dense_ids: Optional[list] = None,
                     span_stages: Optional[list] = None) -> ray.data.Dataset:
    """Full pipeline → flat span rows with final sequence position
    (schema.FLAT_SPAN_SCHEMA) — the shuffle-friendly output representation.
    ``span_stages`` as in :func:`build_out_docs`."""
    out_docs = build_out_docs(docs, cfg, backend, dense_keys=dense_keys,
                              dense_ids=dense_ids, span_stages=span_stages)

    def flatten(batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        spans = batch.column("spans").combine_chunks()
        flat = pc.list_flatten(spans)
        parents = pc.list_parent_indices(spans)
        doc_ids = pc.take(batch.column("doc_id"), parents)
        # sequence position within each doc = offset into its list
        lengths = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
        import numpy as np

        seq = np.concatenate([np.arange(n, dtype=np.int32) for n in lengths]) \
            if len(lengths) else np.zeros(0, dtype=np.int32)
        return pa.table({
            "doc_id": doc_ids,
            "seq": pa.array(seq, pa.int32()),
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
            "offset": flat.field("offset"),
            "order": flat.field("order"),
        })

    return out_docs.map_batches(flatten, batch_format="pyarrow")


def extraction_pipeline(input_path: str,
                        cfg: Optional[PipelineConfig] = None,
                        backend: str = "surrogate",
                        columns: Optional[list[str]] = None) -> ray.data.Dataset:
    """read → full pipeline, from a document table path."""
    from ..sources.docs import read_docs

    docs = read_docs(input_path, columns=columns or ["doc_id", "spans"])
    return build_out_docs(docs, cfg, backend)


_DENSE_IDS_CACHE: dict = {}


def interleaved_extraction(sf_dir: str,
                           cfg: Optional[PipelineConfig] = None,
                           backend: str = "surrogate",
                           repeat: int = 1) -> ray.data.Dataset:
    """read interleaved docs (+ key-only scan for routing) → flat spans.

    The dense-id key scan is a pure function of (sf_dir, repeat,
    threshold) — cached per process so repeated pipeline builds (bench
    best-of-N, a long-running service) pay its serial latency once."""
    from .interleave import read_interleaved_doc_keys, read_interleaved_docs

    cfg = cfg or PipelineConfig()
    key = (sf_dir, repeat, cfg.dense_media_threshold)
    if key not in _DENSE_IDS_CACHE:
        _DENSE_IDS_CACHE[key] = _dense_doc_ids(
            None, cfg.dense_media_threshold,
            read_interleaved_doc_keys(sf_dir, repeat=repeat))
    return build_flat_spans(
        read_interleaved_docs(sf_dir, repeat=repeat), cfg, backend,
        dense_ids=_DENSE_IDS_CACHE[key])

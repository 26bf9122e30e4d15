"""End-to-end extraction pipeline builders (Ray Data, streaming).

Engine equivalent of ``model2annotations`` (inference.py:19-70) — SURVEY.md
§3.1:

    read docs → explode media spans (vectorized Arrow, no pixels)
              → decode (stateless tasks; shape-only rows cross the boundary)
              → detect+extract (actor pool; weights once per actor; fused
                postprocess so model maps never enter the object store)
              → union with original spans → groupby(doc_id) splice
                (the single wide op) → nested span-array documents

Everything is lazy; consume with ``write_parquet`` / ``take`` /
``iter_batches``.  No stage materializes the corpus.
"""
from __future__ import annotations

from typing import Optional

import ray.data

from ..config import PipelineConfig
from ..stages.decode import DecodeStage
from ..stages.detect import DetectExtract
from ..stages.explode import explode_all_spans, explode_media_spans
from ..stages.splice import splice_groups


def _detect_concurrency(cfg: PipelineConfig):
    """Actor-pool size for the detect stage: explicit from config, else an
    autoscaling (1, CPUs-2) pool — leaving headroom so the read/decode/write
    stages are never starved (SURVEY.md §4 intra-op threads row)."""
    if cfg.detect_concurrency is not None:
        return cfg.detect_concurrency
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4))
    return (1, max(2, cpus - 2))


def build_detected_spans(docs: ray.data.Dataset,
                         cfg: Optional[PipelineConfig] = None,
                         backend: str = "surrogate") -> ray.data.Dataset:
    """docs → detected text_line span rows (pre-splice,
    schema.DETECTED_SPAN_SCHEMA)."""
    cfg = cfg or PipelineConfig()
    pages = docs.map_batches(explode_media_spans, batch_format="pyarrow")
    pages = pages.map_batches(DecodeStage(keep_pixels=False),
                              batch_format="pyarrow",
                              batch_size=cfg.postprocess_batch_size)
    detected = pages.map_batches(
        DetectExtract,
        fn_constructor_kwargs={"cfg": cfg, "output": "spans", "backend": backend},
        batch_format="pyarrow",
        batch_size=cfg.detect_batch_size,
        concurrency=_detect_concurrency(cfg),
        num_cpus=1,
    )
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
    return pages.map_batches(
        DetectExtract,
        fn_constructor_kwargs={"cfg": cfg, "output": "blocks", "backend": backend},
        batch_format="pyarrow",
        batch_size=cfg.detect_batch_size,
        concurrency=_detect_concurrency(cfg),
        num_cpus=1,
    )


def build_out_docs(docs: ray.data.Dataset,
                   cfg: Optional[PipelineConfig] = None,
                   backend: str = "surrogate") -> ray.data.Dataset:
    """Full pipeline → nested output documents (schema.OUT_DOC_SCHEMA): the
    input span array re-emitted with detected spans spliced in."""
    cfg = cfg or PipelineConfig()
    originals = docs.map_batches(explode_all_spans, batch_format="pyarrow")
    detected = build_detected_spans(docs, cfg, backend)
    all_spans = originals.union(detected)
    # The one required shuffle: pages of a document reunite on doc_id.
    return all_spans.groupby("doc_id").map_groups(splice_groups,
                                                  batch_format="pyarrow")


def build_flat_spans(docs: ray.data.Dataset,
                     cfg: Optional[PipelineConfig] = None,
                     backend: str = "surrogate") -> ray.data.Dataset:
    """Full pipeline → flat span rows with final sequence position
    (schema.FLAT_SPAN_SCHEMA) — the shuffle-friendly output representation."""
    out_docs = build_out_docs(docs, cfg, backend)

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

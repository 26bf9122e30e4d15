"""ctdray — a Ray-Data-native comic/manga text-detection extraction engine.

Brand-new engine (not a port) with the query/data-processing capabilities of
dmMaze/comic-text-detector, re-expressed Ray-Data-first: a streaming
``ray.data.Dataset`` of interleaved text+media documents flows through
``map_batches`` stages (decode → detect → postprocess → group) with the single
wide operation being a ``groupby(doc_id)`` re-assembly splice.

Layout:
  ctdray.config      pipeline/threshold configuration (reference: inference.py:120-139)
  ctdray.schema      fixed pyarrow schemas for the document/span/block tables
  ctdray.geom        numpy geometry kernels (NMS, min-area-rect, CC labeling, ...)
  ctdray.represent   DBNet-style bitmap→quad extraction (reference: utils/db_utils.py:32-211)
  ctdray.textblock   TextBlock record + grouping/merging/splitting/sorting heuristics
                     (reference: utils/textblock.py)
  ctdray.textmask    per-block mask refinement (reference: utils/textmask.py)
  ctdray.eval        detection-quality metrics (reference: utils/db_utils.py:233-435)
  ctdray.surrogate   deterministic sandbox detector backend (same output contract as
                     the torch/ONNX backends, reference: basemodel.py:222-256)
  ctdray.oracle      single-process reference chain used as the correctness oracle
  ctdray.fixtures    deterministic synthetic corpus/page generator
                     (semantics from reference: text_rendering.py:313-403)
  ctdray.sources     document-table readers/writers + media store (Lance-shaped;
                     Parquet stand-in in-sandbox)
  ctdray.stages      the Ray Data pipeline stages
  ctdray.pipelines   end-to-end pipeline builders
  ctdray.functions   large-scale training-data ops (dedup, similarity, text stats)
  ctdray.state       checkpoint manifest / resume
"""

__version__ = "0.1.0"

import logging as _logging


class _EmptyRefBundleSchemaFilter(_logging.Filter):
    """Drop Ray Data's 'RefBundle with a different schema' warning.

    Ray 2.49's sort-based groupby emits schema-LESS empty blocks for the
    (many) empty boundary partitions whenever distinct keys << partition
    count, and the streaming executor then warns once per empty bundle —
    even for a plain ``groupby().map_groups()`` whose UDF returns a fixed
    schema (minimal repro: 40 single-row blocks, 3 keys).  The warning is
    a false positive for this engine: every combiner declares its output
    columns, and the flagged bundles are the 0-row partition remainders.
    Filtering is scoped to exactly that message."""

    def filter(self, record: _logging.LogRecord) -> bool:
        return "RefBundle with a different schema" not in record.getMessage()


_logging.getLogger(
    "ray.data._internal.execution.streaming_executor_state"
).addFilter(_EmptyRefBundleSchemaFilter())

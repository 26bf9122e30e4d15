from .extract import (  # noqa: F401
    build_detected_spans,
    build_blocks,
    build_out_docs,
    build_flat_spans,
    extraction_pipeline,
)

"""Vectorized per-batch functions for large-scale training-data pipelines
(text analysis, fingerprinting, dedup keys, similarity) — the operations the
reference lacks but a 100 TB corpus engine needs (BASELINE.md engine target).
All functions take/return Arrow tables and are designed to run inside
``Dataset.map_batches(fn, batch_format="pyarrow")``.
"""

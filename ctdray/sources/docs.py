"""Document-table source/sink adapters.

The design target is Lance (`ray.data.read_lance` / `Dataset.write_lance`,
per BASELINE.json north_star); the sandbox has no ``lance`` wheel, so the
adapter transparently falls back to Parquet with the identical schema
(SURVEY.md §7 consequence (a)).  All readers prune columns at the read.
"""
from __future__ import annotations

from typing import Optional

import ray.data

try:  # pragma: no cover - not available in-sandbox
    import lance  # noqa: F401
    _HAVE_LANCE = True
except ImportError:
    _HAVE_LANCE = False


def read_docs(path: str, columns: Optional[list[str]] = None,
              **read_kwargs) -> ray.data.Dataset:
    """Read the interleaved document table (schema.DOC_SCHEMA)."""
    if _HAVE_LANCE and path.endswith(".lance"):
        return ray.data.read_lance(path, columns=columns, **read_kwargs)
    return ray.data.read_parquet(path, columns=columns, **read_kwargs)


def write_docs(ds: ray.data.Dataset, path: str, **write_kwargs) -> None:
    """Write a document-shaped table (nested spans survive the round trip —
    Arrow list<struct> in both formats)."""
    if _HAVE_LANCE and path.endswith(".lance"):
        ds.write_lance(path, **write_kwargs)
    else:
        ds.write_parquet(path, **write_kwargs)

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

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def read_parquet_clean(path: str, columns: list[str] | None = None,
                       **kwargs) -> ray.data.Dataset:
    sch = pq.read_schema(path).remove_metadata()
    if columns:
        sch = pa.schema([sch.field(c) for c in columns])
    return ray.data.read_parquet(path, columns=columns, schema=sch, **kwargs)

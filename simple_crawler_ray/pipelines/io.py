"""Shared table-read helper for the operator catalog.

``read_clean`` wraps ``ray.data.read_parquet`` with an explicit
metadata-free schema for the selected columns: the driver's test parquet
files carry pandas schema metadata (a dict), which breaks Ray's
block-schema hashing ("Failed to hash the schemas (for deduplication):
unhashable type: 'dict'" on every batch) and is implicated in
hash-shuffle schema-alignment flakes. Reading with a clean subset schema
removes the metadata at the source instead of paying a strip operator
per pipeline.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

__all__ = ["read_clean"]

# (path, columns) → clean subset schema; schemas are tiny and stable
_SCHEMA_CACHE: dict = {}


def read_clean(path: str, columns: list[str]) -> rd.Dataset:
    key = (path, tuple(columns))
    sch = _SCHEMA_CACHE.get(key)
    if sch is None:
        full = pq.read_schema(path)
        sch = pa.schema(
            [full.field(c).remove_metadata() for c in columns]
        )
        _SCHEMA_CACHE[key] = sch
    return rd.read_parquet(path, columns=columns, schema=sch)

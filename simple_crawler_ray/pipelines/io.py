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

__all__ = ["read_clean", "retry_join_flake"]

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


# Error fragments of the known intermittent hash-shuffle JoinOperator
# failure (Ray 2.49): an aggregator partition whose accumulated block
# schema lost/duplicated the key column makes pyarrow's per-partition
# Table.join raise an Arrow FieldRef resolution error. The computation
# itself is deterministic, so re-running the lineage is safe and (in
# practice) succeeds — the trigger is empty/misaligned partition blocks,
# not the data.
_JOIN_FLAKE_FRAGMENTS = (
    "No match or multiple matches",
    "for key field",
    "No match for FieldRef",
    "Multiple matches for FieldRef",
)


def _is_join_flake(exc: BaseException) -> bool:
    msg = str(exc)
    return any(f in msg for f in _JOIN_FLAKE_FRAGMENTS)


def retry_join_flake(build_and_run, attempts: int = 3, cleanup=None):
    """Execute ``build_and_run`` (a zero-arg callable that REBUILDS its
    Dataset lineage from source and consumes it), retrying only on the
    known intermittent JoinOperator flake above. ``cleanup`` (optional
    zero-arg callable) runs before each retry to undo partial side
    effects (e.g. a half-written output directory). Any other exception
    propagates immediately; the flake propagates after ``attempts``."""
    last: BaseException | None = None
    for i in range(attempts):
        if i and cleanup is not None:
            cleanup()
        try:
            return build_and_run()
        except Exception as e:  # pragma: no cover - flake is host-dependent
            if not _is_join_flake(e):
                raise
            last = e
    raise last

"""Parquet read helper shared by the query/ANN pipelines.

Parquet files written by pandas/pyarrow carry a file-level ``pandas``
metadata blob on the schema. ``pa.Schema.__hash__`` raises on schemas
WITH metadata (unhashable dict), which defeats Ray Data's schema-dedup
fast path and spams ``Failed to hash the schemas`` from every
hash-shuffle stage those blocks reach. Stripping it is metadata-only
and zero-copy, and the strip stage fuses into the read task.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def strip_schema_metadata(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def read_parquet(path, **kw):
    """rd.read_parquet with schema metadata stripped (batch_size=None
    keeps the strip one zero-copy call per block)."""
    return rd.read_parquet(path, **kw).map_batches(
        strip_schema_metadata, batch_format="pyarrow", batch_size=None)

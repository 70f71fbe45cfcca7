"""Parquet read helper shared by the query/ANN pipelines.

Parquet files written by pandas/pyarrow carry a file-level ``pandas``
metadata blob on the schema. ``pa.Schema.__hash__`` raises on schemas
WITH metadata (unhashable dict), which defeats Ray Data's schema-dedup
fast path and spams ``Failed to hash the schemas`` from every
hash-shuffle stage those blocks reach — including the read operator
itself (union/split of read outputs happens before any downstream
stage can strip).  The fix is applied at the source: the footer schema
is read once on the driver, the metadata dropped, and the clean schema
passed to ``read_parquet`` so every block leaves the read task already
hashable.  A zero-copy strip stage remains as the fallback for inputs
whose footer can't be pre-read (directories, globs).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def strip_schema_metadata(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def _clean_schema(path, columns):
    """Footer schema without metadata, projected to ``columns``.
    Returns None when the input shape isn't a plain file path."""
    import pyarrow.parquet as pq

    p = path
    if isinstance(p, (list, tuple)):
        if not p:
            return None
        p = p[0]
    if not isinstance(p, str) or not p.endswith(".parquet"):
        return None
    try:
        full = pq.read_schema(p).remove_metadata()
        if columns is None:
            return full
        return pa.schema([full.field(c) for c in columns])
    except Exception:
        return None


def read_parquet(path, **kw):
    """rd.read_parquet with schema metadata stripped at the source
    (clean footer schema passed through), falling back to a fused
    zero-copy strip stage when the footer can't be pre-read."""
    if "schema" not in kw:
        sch = _clean_schema(path, kw.get("columns"))
        if sch is not None:
            return rd.read_parquet(path, schema=sch, **kw)
    return rd.read_parquet(path, **kw).map_batches(
        strip_schema_metadata, batch_format="pyarrow", batch_size=None)

"""Tabular source breadth: CSV and JSONL readers with the same
downstream contract as the parquet reader (Arrow batches, schema
metadata stripped so hash-shuffle schema dedup works — see pq.py).

The driver testdata is parquet; these exist so a user of the engine can
point a pipeline at CSV/JSONL exports without a conversion step. Both
wrap Ray Data's native readers (arrow CSV / JSON readers under the
hood), so reads stay distributed and column-pruned where the format
allows (CSV prunes after parse; JSONL parses full records — convert to
parquet for the 100 TB path, these are ingestion conveniences).
"""

from __future__ import annotations

import ray.data as rd

from .pq import strip_schema_metadata


def _strip(ds):
    return ds.map_batches(strip_schema_metadata, batch_format="pyarrow",
                          batch_size=None)


def read_csv(path: str, columns=None, **kw):
    ds = _strip(rd.read_csv(path, **kw))
    if columns:
        ds = ds.select_columns(list(columns))
    return ds


def read_jsonl(path: str, columns=None, **kw):
    ds = _strip(rd.read_json(path, **kw))
    if columns:
        ds = ds.select_columns(list(columns))
    return ds

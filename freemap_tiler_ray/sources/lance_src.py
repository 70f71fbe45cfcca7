"""Lance table source (gated).

The north-rule input is "a Lance table of interleaved text+media
documents" (BASELINE.json input_hint). This sandbox has no `lance` /
`lancedb` package, so the document tables are read from parquet with the
identical schema; this shim is the single switch point — when pylance is
importable, `read_documents` returns a Dataset backed by the Lance
fragment reader instead, with the same downstream contract (Arrow
batches of (doc_id, spans...)).
"""

from __future__ import annotations

try:  # pragma: no cover - not available in this environment
    import lance  # noqa: F401
    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_documents(path: str, columns=None):
    """path: .lance dataset dir or .parquet file."""
    import ray.data as rd

    if HAVE_LANCE and path.endswith(".lance"):
        return rd.read_lance(path, columns=list(columns) if columns else None)
    from .pq import read_parquet
    return read_parquet(path, columns=list(columns) if columns else None)

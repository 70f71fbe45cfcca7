"""Deterministic shared fixtures for the spatial-join layer
(FIXTURES.md F3/F4): the polygon set and the kNN query set, defined once
here and embedded as SQL literals by __ray_entry__.oracle_sql so the
DuckDB oracle sees the exact same float values (repr round-trips).

All geometry is in lon/lat DEGREES treated as a plane — deterministic,
and mirrorable term-for-term in SQL (no trig in returned values).
"""

from __future__ import annotations

import numpy as np

from .stages.geom import regular_polygon


def pip_polygons(n: int = 64):
    """Deterministic convex k-gons over the world in lon/lat degrees.
    -> list of (poly_id, (N,2) ring). The oracle-checked fixture set is
    the default 64; the bench uses a larger n for a
    realistically-compute-heavy join (e.g. admin-boundary scale)."""
    out = []
    for i in range(n):
        g = max(8, int(np.ceil(np.sqrt(n))))
        k = 3 + (i % 8)
        cx = -160.0 + (i % g) * (320.0 / g) + ((i * 7) % 11 - 5)
        cy = -60.0 + (i // g) * (120.0 / g) + ((i * 13) % 7 - 3)
        radius = 5.0 + (i % 5) * 2.0
        phase = 0.1 * i
        out.append((f"poly-{i:02d}", regular_polygon(cx, cy, radius, k, phase)))
    return out


def knn_queries(n: int = 24, k: int = 5):
    """Deterministic query points (same hash family as doc points but a
    disjoint id range). -> list of (query_id, lon, lat), k."""
    from .geo import doc_lonlat

    ids = np.arange(n, dtype=np.int64) + 1_000_000
    lon, lat = doc_lonlat(ids)
    return [(f"q-{i:03d}", float(lon[i]), float(lat[i])) for i in range(n)], k


def polygon_sql_values(polys=None) -> str:
    """VALUES list of polygon edges: (poly_id, x1, y1, x2, y2)."""
    polys = polys or pip_polygons()
    rows = []
    for pid, ring in polys:
        for j in range(len(ring)):
            x1, y1 = ring[j]
            x2, y2 = ring[(j + 1) % len(ring)]
            rows.append(f"('{pid}',{_d(x1)},{_d(y1)},{_d(x2)},{_d(y2)})")
    return ",".join(rows)


def _d(v: float) -> str:
    """Exact SQL DOUBLE literal. Bare numeric literals parse as DECIMAL in
    DuckDB and casting DECIMAL->DOUBLE can lose the last ulp; the
    string->DOUBLE cast is correctly rounded, so round-trip via repr."""
    return f"CAST('{float(v)!r}' AS DOUBLE)"


def query_sql_values(queries=None) -> str:
    """VALUES list of kNN queries: (query_id, qlon, qlat)."""
    if queries is None:
        queries, _ = knn_queries()
    return ",".join(f"('{qid}',{_d(lon)},{_d(lat)})" for qid, lon, lat in queries)

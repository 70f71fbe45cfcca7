"""Vectorized computational-geometry predicates (pure numpy, no shapely).

These are the kernels behind the spatial-join layer: point-in-polygon by
ray casting, and rectangle-polygon intersection (the generalization of
the reference's tile-coverage filter, /root/reference/src/main.rs:183-199,
which tests `tile.bounds() as Polygon intersects bounding_polygon`).

A polygon is a single ring: an (N, 2) float64 array of vertices (closed
implicitly; no holes — the fixtures and the reference's GeoJSON filter
both use simple rings). The ray-casting edge test is written so the
DuckDB oracle can mirror it term-for-term in SQL (see __ray_entry__):
for edge (x1,y1)->(x2,y2) and point (px,py), the edge crosses iff
(y1 > py) != (y2 > py) and px < (x2-x1)*(py-y1)/(y2-y1) + x1.
"""

from __future__ import annotations

import numpy as np


def points_in_polygon(px, py, ring: np.ndarray) -> np.ndarray:
    """Boolean mask: which of the points fall inside the ring (odd-even
    rule, boundary behavior follows the raw comparisons above)."""
    px = np.asarray(px, np.float64)[:, None]
    py = np.asarray(py, np.float64)[:, None]
    x1, y1 = ring[:, 0][None, :], ring[:, 1][None, :]
    x2 = np.roll(ring[:, 0], -1)[None, :]
    y2 = np.roll(ring[:, 1], -1)[None, :]
    straddle = (y1 > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
    crossing = straddle & (px < xint)
    return (crossing.sum(axis=1) % 2).astype(bool)


def _segments_intersect_rects(rx0, ry0, rx1, ry1, ax, ay, bx, by) -> np.ndarray:
    """For M rects (arrays) and E segments (arrays): does segment e
    intersect rect m? Exact separating-axis test, vectorized to (M, E):
    the only candidate axes for segment-vs-AABB are x, y (the box edge
    normals, tested via bbox overlap) and the segment normal (tested via
    the four corners' cross-product signs). Division-free, so the DuckDB
    oracle mirrors it term-for-term."""
    ax, ay = ax[None, :], ay[None, :]
    bx, by = bx[None, :], by[None, :]
    overlap = ((np.maximum(ax, bx) >= rx0[:, None])
               & (np.minimum(ax, bx) <= rx1[:, None])
               & (np.maximum(ay, by) >= ry0[:, None])
               & (np.minimum(ay, by) <= ry1[:, None]))
    dx, dy = bx - ax, by - ay
    all_pos = np.ones_like(overlap)
    all_neg = np.ones_like(overlap)
    for cx, cy in ((rx0, ry0), (rx0, ry1), (rx1, ry0), (rx1, ry1)):
        f = dx * (cy[:, None] - ay) - dy * (cx[:, None] - ax)
        all_pos &= f > 0
        all_neg &= f < 0
    return overlap & ~(all_pos | all_neg)


def rects_intersect_polygon(rx0, ry0, rx1, ry1, ring: np.ndarray) -> np.ndarray:
    """Boolean mask over M rects: does rect m intersect the polygon?
    True iff (a) some polygon vertex is inside the rect, or (b) some rect
    corner is inside the polygon, or (c) some polygon edge crosses the
    rect. Exact for simple polygons — the same predicate set shapely's
    `intersects` reduces to for a box query."""
    rx0 = np.asarray(rx0, np.float64)
    ry0 = np.asarray(ry0, np.float64)
    rx1 = np.asarray(rx1, np.float64)
    ry1 = np.asarray(ry1, np.float64)
    vx, vy = ring[:, 0], ring[:, 1]
    # (a) polygon vertex in rect
    a = ((vx[None, :] >= rx0[:, None]) & (vx[None, :] <= rx1[:, None]) &
         (vy[None, :] >= ry0[:, None]) & (vy[None, :] <= ry1[:, None])).any(axis=1)
    # (b) rect corner (use all 4) in polygon
    b = np.zeros_like(a)
    for cx, cy in ((rx0, ry0), (rx0, ry1), (rx1, ry0), (rx1, ry1)):
        b |= points_in_polygon(cx, cy, ring)
    # (c) polygon edge crosses rect
    c = _segments_intersect_rects(rx0, ry0, rx1, ry1, vx, vy,
                                  np.roll(vx, -1), np.roll(vy, -1)).any(axis=1)
    return a | b | c


def regular_polygon(cx: float, cy: float, radius: float, k: int,
                    phase: float = 0.0) -> np.ndarray:
    """Deterministic regular k-gon ring (FIXTURES.md F3)."""
    ang = phase + 2.0 * np.pi * np.arange(k) / k
    return np.stack([cx + radius * np.cos(ang), cy + radius * np.sin(ang)], axis=1)

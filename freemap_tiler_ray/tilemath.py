"""Vectorized XYZ/web-mercator tile math.

Pure numpy — no Ray. These are the bit-for-bit-critical primitives whose
semantics mirror the `tilemath` crate used by the reference
(`/root/reference/Cargo.toml:25`; call sites cited per function). The XYZ
scheme has y=0 at the north edge, y growing southward; the TMS flip
(`reversed_y`) is applied only at MBTiles write time.

All functions accept scalars or numpy arrays and are fully vectorized.
"""

from __future__ import annotations

import numpy as np

# EPSG:3857 world half-extent in meters (standard web-mercator constant,
# 20037508.342789244 = pi * 6378137).
ORIGIN = 20037508.342789244
WORLD = 2.0 * ORIGIN


def _u(a):
    return np.asarray(a, dtype=np.uint64)


# ---------------------------------------------------------------------------
# Structural tile relations (reference: tilemath crate; call sites
# /root/reference/src/main.rs:221, state.rs:35-63, processor.rs:174,238,339-341)
# ---------------------------------------------------------------------------

def parent(z, x, y):
    """(z-1, x>>1, y>>1). Caller guarantees z >= 1 (z=0 has no parent)."""
    z = np.asarray(z)
    return z - 1, np.asarray(x) >> 1, np.asarray(y) >> 1


def children(z, x, y):
    """The 4 children in the reference's fixed order NW, NE, SW, SE
    (y-down XYZ coords): [(2x,2y), (2x+1,2y), (2x,2y+1), (2x+1,2y+1)]
    — quadrant layout per /root/reference/src/processor.rs:261-262."""
    x2, y2 = np.asarray(x) * 2, np.asarray(y) * 2
    return [(z + 1, x2, y2), (z + 1, x2 + 1, y2),
            (z + 1, x2, y2 + 1), (z + 1, x2 + 1, y2 + 1)]


def ancestor(z, x, y, n):
    """(z-n, x>>n, y>>n). Caller guarantees z >= n.
    Reference: processor.rs:339-341 (megatile ancestor)."""
    return np.asarray(z) - n, np.asarray(x) >> n, np.asarray(y) >> n


def sector_in_ancestor(x, y, n):
    """(x & (2^n - 1), y & (2^n - 1)) — the (sx, sy) offset of this tile
    within its ancestor(n) cell. Reference: processor.rs:453."""
    m = (1 << n) - 1
    return np.asarray(x) & m, np.asarray(y) & m


def reversed_y(z, y):
    """TMS flip: 2^z - 1 - y. Reference: tile_inserter.rs:54,56."""
    return (np.int64(1) << np.asarray(z, dtype=np.int64)) - 1 - np.asarray(y, dtype=np.int64)


# ---------------------------------------------------------------------------
# Morton (z-order) keys — the reference's only sort (main.rs:204), used
# here as the partitioning key so a megatile never straddles partitions.
# ---------------------------------------------------------------------------

def _part1by1(v):
    """Interleave zeros: spread the low 32 bits of v into even bit slots."""
    v = _u(v) & np.uint64(0xFFFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def morton(x, y):
    """64-bit Morton key: bit-interleave of x (even bits) and y (odd bits).
    Sorting (z, morton) reproduces the reference's z-order traversal
    (main.rs:204) within a zoom level."""
    return _part1by1(x) | (_part1by1(y) << np.uint64(1))


def morton_decode(m):
    """Inverse of morton(): returns (x, y)."""
    m = _u(m)

    def compact(v):
        v = v & np.uint64(0x5555555555555555)
        v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
        v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
        return v

    return compact(m), compact(m >> np.uint64(1))


def tile_key(z, x, y):
    """Single uint64 key packing (z, morton(x,y)): zoom in the top 6 bits.
    Used as groupby/shuffle key (morton bits < 58 always hold since z<=29)."""
    return (_u(z) << np.uint64(58)) | morton(x, y)


def tile_key_decode(k):
    k = _u(k)
    z = (k >> np.uint64(58)).astype(np.int64)
    x, y = morton_decode(k & ((np.uint64(1) << np.uint64(58)) - np.uint64(1)))
    return z, x.astype(np.int64), y.astype(np.int64)


# ---------------------------------------------------------------------------
# Geometry: tile bounds and coverage (reference: tilemath bounds()/
# bbox_covered_tiles(); call sites main.rs:173-185, processor.rs:342)
# ---------------------------------------------------------------------------

def tile_span(z):
    """Width of one tile in EPSG:3857 meters at zoom z."""
    return WORLD / (np.float64(1) * (np.int64(1) << np.asarray(z, dtype=np.int64)))


def bounds(z, x, y):
    """EPSG:3857 bbox (min_x, min_y, max_x, max_y) of tile (z,x,y).
    y=0 is the NORTH row, so min_y comes from y+1."""
    s = tile_span(z)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    min_x = -ORIGIN + x * s
    max_x = -ORIGIN + (x + 1) * s
    max_y = ORIGIN - y * s
    min_y = ORIGIN - (y + 1) * s
    return min_x, min_y, max_x, max_y


def point_to_tile(px, py, z):
    """EPSG:3857 point -> containing tile (x, y) at zoom z (floor semantics;
    points on the east/south world edge clamp into the last tile)."""
    n = np.int64(1) << np.asarray(z, dtype=np.int64)
    s = tile_span(z)
    tx = np.floor((np.asarray(px, dtype=np.float64) + ORIGIN) / s).astype(np.int64)
    ty = np.floor((ORIGIN - np.asarray(py, dtype=np.float64)) / s).astype(np.int64)
    return np.clip(tx, 0, n - 1), np.clip(ty, 0, n - 1)


def bbox_covered_tile_range(min_x, min_y, max_x, max_y, z):
    """Inclusive tile index range (x0, y0, x1, y1) of tiles at zoom z whose
    bounds intersect the given EPSG:3857 bbox. Mirrors
    `bbox_covered_tiles` semantics (main.rs:173-181) but returns the
    rectangle of indices, not the materialized list — the tile universe is
    generated distributedly from this range (SURVEY.md §2.2 T3)."""
    n = (1 << int(z)) - 1
    s = float(tile_span(z))
    eps = s * 1e-12
    x0 = int(np.floor((min_x + ORIGIN) / s + eps))
    x1 = int(np.ceil((max_x + ORIGIN) / s - eps)) - 1
    y0 = int(np.floor((ORIGIN - max_y) / s + eps))
    y1 = int(np.ceil((ORIGIN - min_y) / s - eps)) - 1
    return (max(0, min(x0, n)), max(0, min(y0, n)),
            max(0, min(x1, n)), max(0, min(y1, n)))


# ---------------------------------------------------------------------------
# S2-style hierarchical quadtree cell ids for the spatial-join layer.
# A cell at resolution r is simply the web-mercator tile (r, x, y) packed
# into tile_key() — hierarchical (parent = child key with 2 fewer morton
# bits), locality-preserving (morton), and cheap to ring-expand.
# ---------------------------------------------------------------------------

def cell_id(px, py, res):
    """EPSG:3857 point -> quadtree cell id at resolution `res`."""
    tx, ty = point_to_tile(px, py, res)
    return tile_key(np.full_like(tx, res), tx, ty)


def cell_neighbors(z, x, y, ring=1):
    """All cells within Chebyshev distance `ring` of (z,x,y), clamped to the
    world (no wraparound): returns (xs, ys) arrays per input scalar."""
    n = (1 << int(z))
    xs, ys = np.meshgrid(np.arange(x - ring, x + ring + 1),
                         np.arange(y - ring, y + ring + 1))
    xs, ys = xs.ravel(), ys.ravel()
    keep = (xs >= 0) & (xs < n) & (ys >= 0) & (ys < n)
    return xs[keep], ys[keep]

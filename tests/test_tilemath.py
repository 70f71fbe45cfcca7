"""Property tests for the pure tile-math module (SURVEY.md §5 item 1)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from freemap_tiler_ray import tilemath as tm

coords = st.integers(min_value=0, max_value=2**20 - 1)
zooms = st.integers(min_value=0, max_value=20)


@given(zooms, coords, coords)
def test_parent_children_roundtrip(z, x, y):
    x, y = x % (1 << z) if z else 0, y % (1 << z) if z else 0
    for cz, cx, cy in tm.children(z, x, y):
        pz, px, py = tm.parent(cz, cx, cy)
        assert (pz, px, py) == (z, x, y)


@given(zooms, coords, coords, st.integers(min_value=0, max_value=8))
def test_ancestor_sector_identity(z, x, y, n):
    if z < n:
        return
    x, y = x % (1 << z) if z else 0, y % (1 << z) if z else 0
    az, ax, ay = tm.ancestor(z, x, y, n)
    sx, sy = tm.sector_in_ancestor(x, y, n)
    assert az == z - n
    assert (int(ax) << n) + int(sx) == x
    assert (int(ay) << n) + int(sy) == y
    assert 0 <= int(sx) < (1 << n) and 0 <= int(sy) < (1 << n)


@given(zooms, coords)
def test_reversed_y_involution(z, y):
    y = y % (1 << z) if z else 0
    assert tm.reversed_y(z, tm.reversed_y(z, y)) == y


@given(coords, coords)
def test_morton_roundtrip(x, y):
    x2, y2 = tm.morton_decode(tm.morton(x, y))
    assert (int(x2), int(y2)) == (x, y)


def test_morton_zorder_locality():
    # all 4 children of a tile are contiguous in morton order
    xs, ys = np.meshgrid(np.arange(16), np.arange(16))
    m = tm.morton(xs.ravel(), ys.ravel())
    order = np.argsort(m)
    sx, sy = xs.ravel()[order], ys.ravel()[order]
    for i in range(0, 256, 4):
        px, py = sx[i] >> 1, sy[i] >> 1
        assert set(zip(sx[i:i+4].tolist(), sy[i:i+4].tolist())) == {
            (2*px, 2*py), (2*px+1, 2*py), (2*px, 2*py+1), (2*px+1, 2*py+1)}


@given(zooms, coords, coords)
def test_tile_key_roundtrip(z, x, y):
    x, y = x % (1 << z) if z else 0, y % (1 << z) if z else 0
    z2, x2, y2 = tm.tile_key_decode(tm.tile_key(z, x, y))
    assert (int(z2), int(x2), int(y2)) == (z, x, y)


@given(st.integers(min_value=0, max_value=18), coords, coords)
@settings(max_examples=50)
def test_bounds_covered_consistency(z, x, y):
    x, y = x % (1 << z) if z else 0, y % (1 << z) if z else 0
    bx0, by0, bx1, by1 = tm.bounds(z, x, y)
    # shrink slightly so float edges don't pull in neighbors
    pad = (bx1 - bx0) * 1e-6
    x0, y0, x1, y1 = tm.bbox_covered_tile_range(bx0 + pad, by0 + pad,
                                                bx1 - pad, by1 - pad, z)
    assert (x0, y0, x1, y1) == (x, y, x, y)


@given(st.integers(min_value=1, max_value=18), coords, coords)
@settings(max_examples=50)
def test_point_to_tile_center(z, x, y):
    x, y = x % (1 << z), y % (1 << z)
    bx0, by0, bx1, by1 = tm.bounds(z, x, y)
    tx, ty = tm.point_to_tile((bx0 + bx1) / 2, (by0 + by1) / 2, z)
    assert (int(tx), int(ty)) == (x, y)


def test_bounds_world():
    bx0, by0, bx1, by1 = tm.bounds(0, 0, 0)
    assert np.isclose(bx0, -tm.ORIGIN) and np.isclose(by0, -tm.ORIGIN)
    assert np.isclose(bx1, tm.ORIGIN) and np.isclose(by1, tm.ORIGIN)
    # y=0 is the north row at z=1
    _, by0, _, by1 = tm.bounds(1, 0, 0)
    assert by0 == 0.0 and np.isclose(by1, tm.ORIGIN)


def test_cell_neighbors_clamped():
    xs, ys = tm.cell_neighbors(2, 0, 0, ring=1)
    assert set(zip(xs.tolist(), ys.tolist())) == {(0, 0), (0, 1), (1, 0), (1, 1)}
    xs, ys = tm.cell_neighbors(4, 5, 5, ring=1)
    assert len(xs) == 9

"""Example pluggable transforms for the 'pipeline:module:function' CRS
mechanism (geo.resolve_crs) — the sandbox analog of the reference's
--transform-pipeline PROJ strings (/root/reference/src/args.rs:37-43,
warp.rs:22-58). Each factory returns (fwd, inv[, separable]):
  fwd(src_x, src_y) -> (merc_x, merc_y);  inv = the inverse.
A factory runs once per process that resolves the CRS name, so these
work inside Ray workers without any driver-side registration.
"""

from __future__ import annotations

import numpy as np

from . import tilemath as tm


def identity_grid():
    """EPSG:3857 identity, but declared NON-separable — exercises the
    full-grid warp path on data with a known separable-path answer."""
    def ident(x, y):
        return np.asarray(x, np.float64), np.asarray(y, np.float64)

    return ident, ident, False


def rot90_demo(anchor=(4, 9, 5)):
    """A 90-degree-rotated source frame over the anchor tile's mercator
    square — a genuinely non-axis-separable linear transform (each
    source axis mixes both mercator axes):
        inv: (X, Y) -> (u, v) = (cx + (Y - cy), cy - (X - cx))
    A scene stored in this frame holds the anchor scene's pixels as
    A.transpose(1, 0, 2)[:, ::-1] (see tests/test_transform_pipeline)."""
    bx0, by0, bx1, by1 = tm.bounds(*anchor)
    cx, cy = (bx0 + bx1) / 2.0, (by0 + by1) / 2.0

    def inv(x, y):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        return cx + (y - cy), cy - (x - cx)

    def fwd(u, v):
        u = np.asarray(u, np.float64)
        v = np.asarray(v, np.float64)
        return cx - (v - cy), cy + (u - cx)

    return fwd, inv, False

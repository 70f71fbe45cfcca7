"""Megatile -> leaf-tile sector extraction (flat-map-shaped map_batches).

Mirrors /root/reference/src/processor.rs:453-490: each megatile splits
into up to 4^offset tile_size sectors; only pixels with alpha > 0 are
kept (color channels zeroed under transparent pixels); an all-transparent
sector becomes an empty-marker row (status="empty", empty pixel blob —
the K4 marker semantics, processor.rs:594-601).

Leaves outside the coverage range or the optional bounding polygon are
dropped entirely (not marked) — the reference never enqueues them
(main.rs:183-199).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import tilemath as tm
from .geom import rects_intersect_polygon


class SectorStage:
    def __init__(self, tile_size: int, warp_zoom_offset: int, bands: int,
                 leaf_range: tuple[int, int, int, int],
                 polygon_ring: np.ndarray | None = None):
        self.ts = tile_size
        self.offset = warp_zoom_offset
        self.bands = bands
        self.leaf_range = leaf_range
        self.ring = (np.asarray(polygon_ring, np.float64)
                     if polygon_ring is not None else None)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ts, b, n = self.ts, self.bands, 1 << self.offset
        S = ts << self.offset
        x0, y0, x1, y1 = self.leaf_range
        out = {"zoom": [], "x": [], "y": [], "pixels": [], "status": []}
        for i in range(batch.num_rows):
            mz = int(batch["mz"][i].as_py())
            mx, my = int(batch["mx"][i].as_py()), int(batch["my"][i].as_py())
            mega = np.frombuffer(batch["pixels"][i].as_py(), np.uint8)
            mega = mega.reshape(S, S, b)
            z = mz + self.offset
            # leaves of this megatile clipped to the coverage range
            lx = np.arange(mx << self.offset, (mx + 1) << self.offset)
            ly = np.arange(my << self.offset, (my + 1) << self.offset)
            lx = lx[(lx >= x0) & (lx <= x1)]
            ly = ly[(ly >= y0) & (ly <= y1)]
            if len(lx) == 0 or len(ly) == 0:
                continue
            gx, gy = np.meshgrid(lx, ly)
            gx, gy = gx.ravel(), gy.ravel()
            if self.ring is not None:
                bx0, by0, bx1, by1 = tm.bounds(z, gx, gy)
                keep = rects_intersect_polygon(bx0, by0, bx1, by1, self.ring)
                gx, gy = gx[keep], gy[keep]
            # vectorized sector view: (ny, ts, nx, ts, b) -> per-leaf slices
            blocks = mega.reshape(n, ts, n, ts, b)
            for x, y in zip(gx.tolist(), gy.tolist()):
                sx, sy = x & (n - 1), y & (n - 1)
                sec = blocks[sy, :, sx, :, :]
                alpha = sec[:, :, -1]
                if not alpha.any():
                    out["zoom"].append(z); out["x"].append(x); out["y"].append(y)
                    out["pixels"].append(b""); out["status"].append("empty")
                    continue
                kept = np.where(alpha[:, :, None] > 0, sec, 0).astype(np.uint8)
                out["zoom"].append(z); out["x"].append(x); out["y"].append(y)
                out["pixels"].append(kept.tobytes()); out["status"].append("data")
        return pa.table({
            "zoom": pa.array(out["zoom"], pa.int32()),
            "x": pa.array(out["x"], pa.int64()),
            "y": pa.array(out["y"], pa.int64()),
            "pixels": pa.array(out["pixels"], pa.binary()),
            "status": pa.array(out["status"], pa.string()),
        })

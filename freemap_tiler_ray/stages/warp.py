"""Warp stage: reproject + resample megatiles (actor pool).

Ray-Data-native replacement for the reference's GDAL warp
(/root/reference/src/warp.rs:15-99, megatile setup processor.rs:325-451):
one input row per megatile (the ancestor cell at zoom max_zoom - offset,
amortizing one warp over 4^offset leaf tiles, args.rs:59-61), one output
row per megatile with the warped interleaved RGBA/GA buffer.

This is a stateful stage (SURVEY.md §2.3 ST1): the actor opens the scene
once in __init__ (mmap — the GDAL-handle-pool analog) and reuses it per
batch. Use with:
    ds.map_batches(WarpStage, fn_constructor_kwargs=..., concurrency=N,
                   batch_format="pyarrow", batch_size=small)

Source reads are window-pruned: only the source rows/cols the megatile
footprint (plus kernel radius) touches are read from the mmap — the
analog of GDAL's chunked warp reads, and what keeps a 100 TB source from
being shipped to every task.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import tilemath as tm
from ..raster import open_scene, with_alpha
from ..resample import separable_warp


_SCENE_CACHE: dict = {}


def _cached_scene(path: str):
    """Once-per-worker-process scene handle (module-global cache). This
    gives map_batches TASKS the amortized-open behavior of an actor pool
    without reserving CPUs — Ray reuses worker processes, so the mmap is
    opened once per worker, and the stage stays elastic (an actor pool
    sized to the node starves the downstream sector/encode stages).
    Mosaic sources cache one mmap per member."""
    if path not in _SCENE_CACHE:
        from ..raster import MosaicSpec, load_raster_spec
        spec = load_raster_spec(path)
        if isinstance(spec, MosaicSpec):
            _SCENE_CACHE[path] = (spec, [open_scene(m) for m in spec.members])
        else:
            _SCENE_CACHE[path] = (spec, open_scene(spec))
    return _SCENE_CACHE[path]


class WarpStage:
    """Picklable stage config: holds only the spec PATH (never the mmap),
    so shipping the callable to tasks is bytes, not pixels; the handle
    resolves through the per-worker cache at call time."""

    def __init__(self, scene_spec_path: str, tile_size: int = 256,
                 warp_zoom_offset: int = 3, kernel: str = "lanczos3"):
        self.path = scene_spec_path
        self.ts = tile_size
        self.offset = warp_zoom_offset
        self.kernel = kernel

    @property
    def spec(self):
        return _cached_scene(self.path)[0]

    @property
    def img(self):
        return _cached_scene(self.path)[1]

    @property
    def bands(self):
        return self.spec.band_count

    def __getstate__(self):
        return {"path": self.path, "ts": self.ts, "offset": self.offset,
                "kernel": self.kernel}

    def __setstate__(self, st):
        self.__dict__.update(st)

    def _warp_one(self, mz: int, mx: int, my: int) -> np.ndarray:
        from ..raster import MosaicSpec
        if isinstance(self.spec, MosaicSpec):
            # VRT-overlay semantics: later members win where they have
            # alpha > 0 (GDAL VRT draw order, README.md:73-77)
            out = None
            for member, img in zip(self.spec.members, self.img):
                part = self._warp_scene(member, img, mz, mx, my)
                if out is None:
                    out = part
                else:
                    covered = part[:, :, -1] > 0
                    out[covered] = part[covered]
            return out
        return self._warp_scene(self.spec, self.img, mz, mx, my)

    def _warp_scene(self, spec, img, mz: int, mx: int, my: int) -> np.ndarray:
        S = self.ts << self.offset
        bx0, by0, bx1, by1 = tm.bounds(mz, mx, my)
        # target pixel centers in EPSG:3857 (y row 0 = north)
        X = bx0 + (np.arange(S) + 0.5) * ((bx1 - bx0) / S)
        Y = by1 - (np.arange(S) + 0.5) * ((by1 - by0) / S)
        if not spec.crs_separable:
            return self._warp_grid(spec, img, X, Y, S)
        col, _ = spec.mercator_to_source_px(X, np.full_like(X, (by0 + by1) / 2))
        _, row = spec.mercator_to_source_px(np.full_like(Y, (bx0 + bx1) / 2), Y)

        # window-pruned source read (+ kernel radius margin)
        scale_x = max(abs(float(col[-1] - col[0])) / max(S - 1, 1), 1e-12)
        scale_y = max(abs(float(row[-1] - row[0])) / max(S - 1, 1), 1e-12)
        mrg_x = int(np.ceil(3.0 * max(scale_x, 1.0))) + 2
        mrg_y = int(np.ceil(3.0 * max(scale_y, 1.0))) + 2
        c0 = max(0, int(np.floor(col.min())) - mrg_x)
        c1 = min(spec.width, int(np.ceil(col.max())) + mrg_x)
        r0 = max(0, int(np.floor(row.min())) - mrg_y)
        r1 = min(spec.height, int(np.ceil(row.max())) + mrg_y)
        if c0 >= c1 or r0 >= r1:
            return np.zeros((S, S, self.bands), np.uint8)
        window = with_alpha(np.asarray(img[r0:r1, c0:c1]), spec.bands)

        out = separable_warp(window, col - c0, row - r0, scale_x, scale_y,
                             kernel=self.kernel)
        # T7 nodata -> transparent (processor.rs:404-439): any band equal to
        # its nodata zeroes the whole pixel (color + alpha)
        if spec.nodata is not None:
            nod = (out[:, :, :spec.bands] == int(spec.nodata)).any(axis=2)
            out[nod] = 0
        return out

    def _warp_grid(self, spec, img, X, Y, S: int) -> np.ndarray:
        """Non-separable (pipeline-CRS) path: full dst->src coordinate
        grid + resample.grid_warp — the analog of GDAL warping through an
        arbitrary PROJ pipeline (warp.rs:22-58). Window pruning and the
        nodata rule are identical to the separable path."""
        from ..resample import grid_warp
        Xg, Yg = np.meshgrid(X, Y)
        col, row = spec.mercator_to_source_px(Xg, Yg)
        # local pixel-size ratios: median absolute neighbor step
        scale_x = max(float(np.median(np.abs(np.diff(col, axis=1)))), 1e-12)
        scale_y = max(float(np.median(np.abs(np.diff(row, axis=0)))), 1e-12)
        mrg = int(np.ceil(3.0 * max(scale_x, scale_y, 1.0))) + 2
        c0 = max(0, int(np.floor(col.min())) - mrg)
        c1 = min(spec.width, int(np.ceil(col.max())) + mrg)
        r0 = max(0, int(np.floor(row.min())) - mrg)
        r1 = min(spec.height, int(np.ceil(row.max())) + mrg)
        if c0 >= c1 or r0 >= r1:
            return np.zeros((S, S, self.bands), np.uint8)
        window = with_alpha(np.asarray(img[r0:r1, c0:c1]), spec.bands)
        out = grid_warp(window, col - c0, row - r0, scale_x, scale_y,
                        kernel=self.kernel)
        if spec.nodata is not None:
            nod = (out[:, :, :spec.bands] == int(spec.nodata)).any(axis=2)
            out[nod] = 0
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        mzs = batch["mz"].to_numpy()
        mxs = batch["mx"].to_numpy()
        mys = batch["my"].to_numpy()
        bufs = [self._warp_one(int(z), int(x), int(y)).tobytes()
                for z, x, y in zip(mzs, mxs, mys)]
        return pa.table({"mz": batch["mz"], "mx": batch["mx"], "my": batch["my"],
                         "pixels": pa.array(bufs, type=pa.binary())})

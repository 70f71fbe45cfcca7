"""Raster scene model + deterministic synthetic fixtures.

Stands in for the reference's GDAL source dataset
(/root/reference/src/main.rs:80-110): a scene is a (H, W, B) uint8 numpy
array on disk (.npy, mmap-readable — the actor-pool analog of the GDAL
handle pool, processor.rs:34) plus a JSON sidecar carrying the
georeference (axis-aligned geotransform, like geo.rs:4-25, no rotation)
and band layout.

Band semantics mirror main.rs:82-110 + processor.rs:86: accepted source
layouts are G / GA / RGB / RGBA; the internal representation always
carries a trailing alpha band (band_count = ((bands + 1) / 2) * 2).
Alpha-less sources get a fully-opaque alpha plane — the practical GDAL
behavior with a mask band (README.md:115-165 always builds one; see
SURVEY.md §7.5 for why the literal MEM-dataset-nodata path is inert).
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from . import tilemath as tm
from .geo import (lonlat_to_mercator, mercator_to_lonlat, resolve_crs,
                  transform_bounds)


@dataclasses.dataclass
class SceneSpec:
    scene_id: str
    path: str                      # .npy file of (H, W, B) uint8
    width: int
    height: int
    bands: int                     # source band count: 1|2|3|4
    crs: str                       # "EPSG:3857" | "EPSG:4326"
    origin_x: float                # geotransform: top-left corner
    origin_y: float
    px_w: float                    # pixel width (source units, > 0)
    px_h: float                    # pixel height (source units, > 0; rows go down)
    nodata: float | None = None    # per-band nodata value (T7)

    @property
    def band_count(self) -> int:
        """Internal even band count with alpha (processor.rs:86)."""
        return ((self.bands + 1) // 2) * 2

    def source_bbox(self):
        """(min_x, min_y, max_x, max_y) in source CRS (geo.rs:4-25)."""
        return (self.origin_x, self.origin_y - self.height * self.px_h,
                self.origin_x + self.width * self.px_w, self.origin_y)

    def mercator_bbox(self, densify_pts: int = 21):
        """Source bbox reprojected to EPSG:3857 with densification
        (main.rs:166-169). Any registered / pipeline CRS works — the
        forward transform comes from geo.resolve_crs."""
        b = self.source_bbox()
        if self.crs == "EPSG:3857":
            return b
        fwd, _, _ = resolve_crs(self.crs)
        return transform_bounds(fwd, *b, densify_pts=densify_pts)

    @property
    def crs_separable(self) -> bool:
        """True when merc_x depends only on src_x and merc_y only on
        src_y — the condition for the fast separable warp (T6); pipeline
        CRS entries declare this themselves (geo.register_crs)."""
        return resolve_crs(self.crs)[2]

    def mercator_to_source_px(self, X, Y):
        """EPSG:3857 coords -> fractional source pixel coords (col, row),
        pixel-center convention (integer + 0.5 = center). Accepts 1-D
        axes (separable CRS) or full 2-D grids (pipeline CRS)."""
        if self.crs == "EPSG:3857":
            sx, sy = np.asarray(X, np.float64), np.asarray(Y, np.float64)
        else:
            _, inv, _ = resolve_crs(self.crs)
            sx, sy = inv(X, Y)
        col = (sx - self.origin_x) / self.px_w
        row = (self.origin_y - sy) / self.px_h
        return col, row

    def save(self):
        with open(self.path + ".json", "w") as f:
            json.dump(dataclasses.asdict(self), f)

    @classmethod
    def load(cls, path: str) -> "SceneSpec":
        with open(path + ".json") as f:
            d = json.load(f)
        d["path"] = path
        return cls(**d)


def open_scene(spec: SceneSpec) -> np.ndarray:
    """mmap the scene pixels (the GDAL-handle analog held by warp actors)."""
    return np.load(spec.path, mmap_mode="r")


def with_alpha(img: np.ndarray, bands: int) -> np.ndarray:
    """Pad G -> GA or RGB -> RGBA with opaque alpha (see module docstring)."""
    if bands % 2 == 0:
        return img
    alpha = np.full(img.shape[:2] + (1,), 255, np.uint8)
    return np.concatenate([img, alpha], axis=2)


# ---------------------------------------------------------------------------
# Synthetic fixtures (FIXTURES.md F2): deterministic gradient + disk mask
# ---------------------------------------------------------------------------

def gradient_disk_pixels(size: int, bands: int = 4,
                         disk_frac: float = 400.0 / 1024.0) -> np.ndarray:
    """R=x%256, G=y%256, B=(x+y)%256, alpha=255 inside the centered disk of
    radius disk_frac*size (integer-coordinate test: (x-c)^2+(y-c)^2 < r^2),
    else 0. 2-band variant: L=(x+y)%256 + same alpha. Generated in row
    bands so big bench scenes don't allocate size^2 int64 temporaries."""
    c, r2 = size // 2, (disk_frac * size) ** 2
    xs = np.arange(size, dtype=np.int64)
    xmod = (xs % 256).astype(np.uint8)
    dx2 = ((xs - c) ** 2).astype(np.int64)
    img = np.empty((size, size, bands), np.uint8)
    chunk = max(1, (1 << 24) // size)
    for r0 in range(0, size, chunk):
        r1 = min(size, r0 + chunk)
        ys = xs[r0:r1]
        alpha = np.where(dx2[None, :] + dx2[r0:r1, None] < r2, 255, 0) \
            .astype(np.uint8)
        xy = (xmod[None, :].astype(np.int16) + ys[:, None] % 256) % 256
        if bands == 4:
            img[r0:r1, :, 0] = xmod[None, :]
            img[r0:r1, :, 1] = (ys % 256).astype(np.uint8)[:, None]
            img[r0:r1, :, 2] = xy.astype(np.uint8)
            img[r0:r1, :, 3] = alpha
        elif bands == 2:
            img[r0:r1, :, 0] = xy.astype(np.uint8)
            img[r0:r1, :, 1] = alpha
        else:
            raise ValueError("gradient_disk supports 2 or 4 bands")
    return img


class MosaicSpec:
    """Multi-scene source — the VRT-mosaic analog (the reference's
    production inputs are GDAL VRTs over hundreds of files,
    README.md:73-77). A mosaic is an ordered list of member SceneSpecs in
    a shared CRS; a warped sample takes the LAST member with alpha > 0 at
    that location (GDAL VRT overlay order). Persisted as a .mosaic.json
    listing member sidecar paths."""

    def __init__(self, scene_id: str, path: str, members: list):
        self.scene_id = scene_id
        self.path = path
        self.members = members          # list[SceneSpec]
        self.crs = members[0].crs
        self.bands = members[0].bands
        if any(m.crs != self.crs or m.bands != self.bands for m in members):
            raise ValueError("mosaic members must share CRS and band layout")

    @property
    def band_count(self) -> int:
        return ((self.bands + 1) // 2) * 2

    def source_bbox(self):
        boxes = [m.source_bbox() for m in self.members]
        return (min(b[0] for b in boxes), min(b[1] for b in boxes),
                max(b[2] for b in boxes), max(b[3] for b in boxes))

    def mercator_bbox(self, densify_pts: int = 21):
        if self.crs == "EPSG:3857":
            return self.source_bbox()
        fwd, _, _ = resolve_crs(self.crs)
        return transform_bounds(fwd, *self.source_bbox(),
                                densify_pts=densify_pts)

    def save(self):
        with open(self.path, "w") as f:
            json.dump({"scene_id": self.scene_id,
                       "members": [m.path for m in self.members]}, f)

    @classmethod
    def load(cls, path: str) -> "MosaicSpec":
        with open(path) as f:
            d = json.load(f)
        return cls(d["scene_id"], path,
                   [SceneSpec.load(p) for p in d["members"]])


def load_raster_spec(path: str):
    """Polymorphic loader: .mosaic.json -> MosaicSpec, else SceneSpec."""
    if path.endswith(".mosaic.json"):
        return MosaicSpec.load(path)
    return SceneSpec.load(path)


def make_scene(path: str, anchor=(4, 9, 5), size: int = 1024, bands: int = 4,
               crs: str = "EPSG:3857", disk_frac: float = 400.0 / 1024.0) -> SceneSpec:
    """Write a synthetic scene exactly covering the EPSG:3857 bounds of the
    anchor tile, so tile assignment has a closed-form oracle. For
    crs=4326 the pixel grid is regular in lon/lat over the same corner
    points (exercises the reprojection path, main.rs:138-169)."""
    if not str(path).endswith(".npy"):
        path = path + ".npy"
    img = gradient_disk_pixels(size, bands, disk_frac)
    with open(path, "wb") as f:
        np.save(f, img)
    bx0, by0, bx1, by1 = tm.bounds(*anchor)
    if crs == "EPSG:3857":
        ox, oy = bx0, by1
        pw, ph = (bx1 - bx0) / size, (by1 - by0) / size
    elif crs == "EPSG:4326":
        lon0, lat1 = mercator_to_lonlat(bx0, by0)
        lon1, lat0 = mercator_to_lonlat(bx1, by1)  # lat0 = north lat
        ox, oy = float(lon0), float(lat0)
        pw, ph = (float(lon1) - float(lon0)) / size, (float(lat0) - float(lat1)) / size
    else:
        raise ValueError(crs)
    spec = SceneSpec(scene_id=os.path.basename(path)[:-4], path=path,
                     width=size, height=size, bands=bands, crs=crs,
                     origin_x=float(ox), origin_y=float(oy),
                     px_w=float(pw), px_h=float(ph))
    spec.save()
    return spec

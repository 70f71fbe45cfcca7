"""Coordinate transforms + deterministic geo-referencing of documents.

Pure numpy. Replaces the reference's PROJ/GDAL transform layer
(/root/reference/src/main.rs:138-169, geo.rs:4-25) with explicit
EPSG:4326 <-> EPSG:3857 math (the sandbox has no pyproj/GDAL; the
Transform abstraction accepts any callable pair, so additional SRS
support plugs in without touching pipeline code).

The doc_id -> (lon, lat) hash here is the load-bearing contract with the
DuckDB oracle: `__ray_entry__.oracle_sql` re-derives the identical values
with 64-bit-safe integer arithmetic (no multiplication ever exceeds
2^63-1, because DuckDB raises on BIGINT overflow rather than wrapping).
"""

from __future__ import annotations

import numpy as np

from .tilemath import ORIGIN

R_EARTH = 6378137.0
_M32 = np.uint64(0xFFFFFFFF)


# ---------------------------------------------------------------------------
# EPSG:4326 <-> EPSG:3857 (spherical web mercator)
# ---------------------------------------------------------------------------

def lonlat_to_mercator(lon, lat):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = lon * (ORIGIN / 180.0)
    y = np.log(np.tan((90.0 + lat) * (np.pi / 360.0))) * R_EARTH
    return x, y


def mercator_to_lonlat(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = x / (ORIGIN / 180.0)
    lat = np.arctan(np.exp(y / R_EARTH)) * (360.0 / np.pi) - 90.0
    return lon, lat


# ---------------------------------------------------------------------------
# Pluggable CRS registry — the sandbox analog of the reference's
# --transform-pipeline (PROJ pipeline string, warp.rs:22-58, args.rs:37-43):
# a transform is a callable pair resolved BY NAME in every process, so a
# 'pipeline:module:function' spec travels to Ray workers as a string and
# each worker imports/instantiates it locally (exactly how the reference
# hands the PROJ string to each thread).
# ---------------------------------------------------------------------------

_CRS_REGISTRY: dict[str, tuple] = {}


def register_crs(name: str, fwd, inv, separable: bool = True) -> None:
    """Register a transform pair under `name` (usable as SceneSpec.crs).
    fwd: (src_x, src_y) -> (merc_x, merc_y); inv: the inverse.
    separable=True promises merc_x depends only on src_x and merc_y only
    on src_y (enables the fast separable warp; otherwise the warp falls
    back to the full-grid path)."""
    _CRS_REGISTRY[name] = (fwd, inv, bool(separable))


def resolve_crs(name: str):
    """(fwd, inv, separable) for a CRS name: the EPSG built-ins, any
    register_crs() entry, or a 'pipeline:module:function' spec whose
    factory (imported lazily in the calling process — worker-safe)
    returns (fwd, inv) or (fwd, inv, separable)."""
    got = _CRS_REGISTRY.get(name)
    if got is not None:
        return got
    if name == "EPSG:3857":
        ident = lambda x, y: (np.asarray(x, np.float64),  # noqa: E731
                              np.asarray(y, np.float64))
        got = (ident, ident, True)
    elif name == "EPSG:4326":
        got = (lonlat_to_mercator, mercator_to_lonlat, True)
    elif name.startswith("pipeline:"):
        import importlib

        mod_name, func = name[len("pipeline:"):].rsplit(":", 1)
        factory = getattr(importlib.import_module(mod_name), func)
        parts = tuple(factory())
        got = parts if len(parts) == 3 else parts + (True,)
    elif name.startswith("+proj=pipeline"):
        # verbatim PROJ pipeline string (the reference's
        # --transform-pipeline passthrough, args.rs:37-43): fwd is
        # source -> EPSG:3857, same convention as the built-ins
        from .proj_pipeline import parse_proj_pipeline
        got = parse_proj_pipeline(name)
    elif name.startswith("+proj="):
        # bare source-CRS string (utm/tmerc/lcc/krovak/longlat, with
        # optional +towgs84 datum shift) — the reference hands exactly
        # these to GDAL as the source SRS (main.rs:80)
        from .proj_pipeline import parse_source_crs
        got = parse_source_crs(name)
    elif name.startswith("EPSG:"):
        from .proj_pipeline import resolve_epsg
        got = resolve_epsg(name)
        if got is None:
            raise ValueError(
                f"unknown EPSG code {name!r}: built-ins are 4326/3857, "
                f"UTM 326xx/327xx, ETRS89-UTM 258xx, S-JTSK 5513/5514, "
                f"3395 (World Mercator), 3035 (LAEA Europe), 5070 "
                f"(Conus Albers), 3413/3031/3976 (polar stereo); other "
                f"CRS plug in as a '+proj=...' string or a "
                f"register_crs() entry")
    else:
        raise ValueError(
            f"unsupported CRS {name!r}: use an EPSG code, a "
            f"register_crs() name, 'pipeline:module:function', a "
            f"'+proj=pipeline ...' string, or a bare '+proj=...' "
            f"source-CRS string")
    _CRS_REGISTRY[name] = got
    return got


def transform_bounds(fwd, min_x, min_y, max_x, max_y, densify_pts=21):
    """Densified bbox transform, mirroring GDAL's transform_bounds with
    21-point densification (reference main.rs:166-169): sample each edge at
    `densify_pts` points, transform all samples, take the envelope."""
    t = np.linspace(0.0, 1.0, densify_pts)
    xs = np.concatenate([
        min_x + t * (max_x - min_x), np.full_like(t, max_x),
        min_x + t * (max_x - min_x), np.full_like(t, min_x)])
    ys = np.concatenate([
        np.full_like(t, min_y), min_y + t * (max_y - min_y),
        np.full_like(t, max_y), min_y + t * (max_y - min_y)])
    tx, ty = fwd(xs, ys)
    return float(tx.min()), float(ty.min()), float(tx.max()), float(ty.max())


# ---------------------------------------------------------------------------
# Deterministic doc geo-referencing (FIXTURES.md F1, adapted to the int64
# doc_id of /root/testdata's documents table).
# ---------------------------------------------------------------------------

def _mix32(v):
    """32-bit integer mix (the classic xorshift-multiply hash). All
    intermediates stay below 2^63 so the DuckDB mirror is overflow-safe:
    max product = (2^32-1) * 0x45d9f3b ~ 3.1e17 < 2^63."""
    v = np.asarray(v, dtype=np.uint64) & _M32
    v = ((v >> np.uint64(16)) ^ v) * np.uint64(0x45D9F3B) & _M32
    v = ((v >> np.uint64(16)) ^ v) * np.uint64(0x45D9F3B) & _M32
    v = ((v >> np.uint64(16)) ^ v) & _M32
    return v


def doc_lonlat(doc_id):
    """doc_id (int64 array) -> deterministic (lon, lat) in degrees.

    lon in [-180, 180), lat in [-85, 85). SQL mirror (see __ray_entry__):
      h1 = mix32(doc_id % 2^32), h2 = mix32((doc_id + 0x5bd1e995) % 2^32)
      lon = -180 + (h1 % 360000000) / 1e6
      lat =  -85 + (h2 % 170000000) / 1e6
    """
    d = np.asarray(doc_id, dtype=np.uint64) & _M32
    h1 = _mix32(d)
    h2 = _mix32((d + np.uint64(0x5BD1E995)) & _M32)
    lon = -180.0 + (h1 % np.uint64(360000000)).astype(np.float64) / 1e6
    lat = -85.0 + (h2 % np.uint64(170000000)).astype(np.float64) / 1e6
    return lon, lat


def doc_mercator(doc_id):
    lon, lat = doc_lonlat(doc_id)
    return lonlat_to_mercator(lon, lat)

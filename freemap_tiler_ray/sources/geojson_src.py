"""GeoJSON bounding-polygon reader (stdlib json, no shapely).

Mirrors /root/reference/src/geojson.rs:9-55: takes the FIRST Polygon
found in a Feature / FeatureCollection / bare geometry, outer ring only,
and reprojects EPSG:4326 -> EPSG:3857. The result is the broadcast small
side of the tile-coverage semi-join (main.rs:183-199).
"""

from __future__ import annotations

import json

import numpy as np

from ..geo import lonlat_to_mercator


def _find_polygon(obj) -> list | None:
    t = obj.get("type")
    if t == "Polygon":
        return obj["coordinates"]
    if t == "MultiPolygon":
        return obj["coordinates"][0]
    if t == "Feature":
        return _find_polygon(obj.get("geometry") or {})
    if t == "FeatureCollection":
        for feat in obj.get("features", []):
            ring = _find_polygon(feat)
            if ring is not None:
                return ring
    return None


def read_bounding_polygon(path: str) -> np.ndarray:
    """-> (N, 2) float64 ring in EPSG:3857 (closing vertex dropped)."""
    with open(path) as f:
        obj = json.load(f)
    coords = _find_polygon(obj)
    if coords is None:
        raise ValueError(f"no Polygon found in {path}")
    ring = np.asarray(coords[0], np.float64)
    if len(ring) > 1 and np.array_equal(ring[0], ring[-1]):
        ring = ring[:-1]
    x, y = lonlat_to_mercator(ring[:, 0], ring[:, 1])
    return np.stack([x, y], axis=1)

"""Verbatim +proj=pipeline string support (reference --transform-pipeline
passthrough, args.rs:37-43, warp.rs:22-58): the from-scratch subset
parser must agree with the engine's built-in spherical-mercator math,
invert exactly, honour +inv and axisswap/affine semantics, and plug into
resolve_crs / WarpStage like any other CRS."""

import numpy as np
import pytest

from freemap_tiler_ray import geo
from freemap_tiler_ray.proj_pipeline import parse_proj_pipeline

DEG_TO_MERC = ("+proj=pipeline "
               "+step +proj=unitconvert +xy_in=deg +xy_out=rad "
               "+step +proj=webmerc")


def _grid():
    lon, lat = np.meshgrid(np.linspace(-179, 179, 21),
                           np.linspace(-84, 84, 17))
    return lon.ravel(), lat.ravel()


def test_deg_webmerc_matches_builtin():
    fwd, inv, sep = parse_proj_pipeline(DEG_TO_MERC)
    assert sep
    lon, lat = _grid()
    x, y = fwd(lon, lat)
    bx, by = geo.lonlat_to_mercator(lon, lat)
    np.testing.assert_allclose(x, bx, rtol=1e-12)
    np.testing.assert_allclose(y, by, rtol=1e-12)
    lon2, lat2 = inv(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_inv_step_flips_direction():
    s = ("+proj=pipeline +step +inv +proj=webmerc "
         "+step +proj=unitconvert +xy_in=rad +xy_out=deg")
    fwd, inv, _ = parse_proj_pipeline(s)     # merc -> lon/lat deg
    lon, lat = _grid()
    mx, my = geo.lonlat_to_mercator(lon, lat)
    glon, glat = fwd(mx, my)
    np.testing.assert_allclose(glon, lon, atol=1e-9)
    np.testing.assert_allclose(glat, lat, atol=1e-9)


def test_axisswap_and_affine():
    fwd, inv, sep = parse_proj_pipeline(
        "+proj=pipeline +step +proj=axisswap +order=2,1")
    assert not sep
    x, y = fwd(np.array([1.0, 2.0]), np.array([3.0, 4.0]))
    assert x.tolist() == [3.0, 4.0] and y.tolist() == [1.0, 2.0]
    x2, y2 = inv(x, y)
    assert x2.tolist() == [1.0, 2.0] and y2.tolist() == [3.0, 4.0]

    fwd, inv, sep = parse_proj_pipeline(
        "+proj=pipeline +step +proj=axisswap +order=1,-2")
    assert sep                                # no swap, sign flip only
    x, y = fwd(np.array([1.0]), np.array([3.0]))
    assert (x[0], y[0]) == (1.0, -3.0)

    fwd, inv, sep = parse_proj_pipeline(
        "+proj=pipeline +step +proj=affine "
        "+xoff=10 +yoff=-5 +s11=0 +s12=-1 +s21=1 +s22=0")  # rot90
    assert not sep
    pts = np.array([2.0, 7.0]), np.array([3.0, 1.0])
    x, y = fwd(*pts)
    np.testing.assert_allclose(x, 10 - pts[1])
    np.testing.assert_allclose(y, -5 + pts[0])
    rx, ry = inv(x, y)
    np.testing.assert_allclose(rx, pts[0])
    np.testing.assert_allclose(ry, pts[1])


def test_unsupported_step_raises():
    # tmerc/utm/lcc/krovak/stere/laea/aea/towgs84 became supported
    # steps (proj_ops); omerc stays an honest ValueError rather than a
    # silent wrong warp
    with pytest.raises(ValueError, match=r"\+proj=omerc"):
        parse_proj_pipeline("+proj=pipeline +step +proj=omerc +lonc=115")
    with pytest.raises(ValueError, match="not a .proj=pipeline"):
        parse_proj_pipeline("+proj=webmerc")


def test_resolve_crs_accepts_proj_string(tmp_path):
    """A scene whose sidecar CRS is the verbatim PROJ string warps to the
    same pixels as its EPSG:4326 twin (same math, different spelling)."""
    import dataclasses
    import os

    from freemap_tiler_ray.raster import make_scene
    from freemap_tiler_ray.stages.warp import WarpStage

    ANCHOR = (4, 9, 5)
    spec = make_scene(str(tmp_path / "a"), anchor=ANCHOR, size=256,
                      bands=4, crs="EPSG:4326", disk_frac=0.3)
    link = str(tmp_path / "a_proj.npy")
    os.symlink(os.path.abspath(spec.path), link)
    spec2 = dataclasses.replace(spec, path=link, crs=DEG_TO_MERC)
    spec2.save()
    assert spec2.crs_separable

    def warp(sp):
        return WarpStage(scene_spec_path=sp.path, tile_size=256,
                         warp_zoom_offset=2)._warp_one(*ANCHOR)

    assert np.array_equal(warp(spec), warp(spec2))

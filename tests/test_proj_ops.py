"""From-scratch projection math (proj_ops) — conformance without PROJ.

Strategy (no pyproj in the sandbox, so no library oracle):
  * exact round-trips fwd(inv) / inv(fwd) over each projection's domain
  * independent cross-checks: numerically integrated meridian arc vs the
    Snyder series; the spherical closed form (f -> 0 limit) vs the
    ellipsoidal series; analytic anchor points (UTM central meridian /
    equator); conformality of the numeric Jacobian (these projections
    are conformal by construction — a non-rotation-similarity Jacobian
    means wrong math, not wrong constants)
  * coarse geographic anchors for Krovak (Prague's well-known S-JTSK
    coordinates, ±15 km) to catch sign/axis/degree-radian errors
"""

import numpy as np
import pytest

from freemap_tiler_ray import proj_ops
from freemap_tiler_ray.geo import lonlat_to_mercator, resolve_crs
from freemap_tiler_ray.proj_pipeline import parse_source_crs

D2R = np.pi / 180.0


def _roundtrip(fwd, inv, lam, phi, tol=1e-9):
    x, y = fwd(lam, phi)
    lam2, phi2 = inv(x, y)
    assert np.abs(lam2 - lam).max() < tol
    assert np.abs(phi2 - phi).max() < tol


def _conformal(fwd, lam, phi, e2, rel=1e-5):
    """Numeric Jacobian of a conformal map satisfies Cauchy-Riemann in
    ellipsoidal isothermal coordinates (lambda, q): dx/dlam = dy/dq and
    dy/dlam = -dx/dq, where d/dq = (dphi/dq) d/dphi with
    dphi/dq = cos(phi) (1 - e^2 sin^2 phi) / (1 - e^2)."""
    h = 1e-7
    x0, y0 = fwd(lam, phi)
    xl, yl = fwd(lam + h, phi)
    xp, yp = fwd(lam, phi + h)
    j11, j21 = (xl - x0) / h, (yl - y0) / h     # d/d lambda
    j12, j22 = (xp - x0) / h, (yp - y0) / h     # d/d phi
    c = np.cos(phi) * (1.0 - e2 * np.sin(phi) ** 2) / (1.0 - e2)
    scale = np.hypot(j11, j21)
    assert (np.abs(j11 - j22 * c) < rel * scale).all()
    assert (np.abs(j21 + j12 * c) < rel * scale).all()


GRID_LAM = np.linspace(12.0, 18.0, 7) * D2R
GRID_PHI = np.linspace(46.0, 53.0, 8) * D2R
LAM, PHI = (g.ravel() for g in np.meshgrid(GRID_LAM, GRID_PHI))


# ---------------------------------------------------------------------------
# tmerc / utm
# ---------------------------------------------------------------------------

def test_meridian_arc_vs_numeric_integration():
    a, e2 = proj_ops.ellipsoid_params({"ellps": "WGS84"})
    for deg in (10.0, 45.0, 80.0):
        phi = deg * D2R
        t = np.linspace(0.0, phi, 200001)
        integ = np.trapz(a * (1 - e2) / (1 - e2 * np.sin(t) ** 2) ** 1.5, t)
        series = proj_ops._meridian_arc(np.float64(phi), a, e2)
        assert abs(series - integ) < 1e-3   # mm agreement


def test_tmerc_roundtrip_and_conformal():
    fwd, inv = proj_ops.tmerc({"lon_0": 15, "k": 0.9996,
                               "x_0": 500000, "ellps": "WGS84"})
    _roundtrip(fwd, inv, LAM, PHI)
    _conformal(fwd, LAM, PHI, proj_ops.ellipsoid_params({"ellps": "WGS84"})[1])


def test_tmerc_central_meridian_is_scaled_meridian_arc():
    a, e2 = proj_ops.ellipsoid_params({"ellps": "WGS84"})
    fwd, _ = proj_ops.tmerc({"lon_0": 15, "k": 0.9996, "x_0": 500000,
                             "ellps": "WGS84"})
    phi = np.array([0.0, 30.0, 50.0, 70.0]) * D2R
    x, y = fwd(np.full_like(phi, 15 * D2R), phi)
    assert np.abs(x - 500000.0).max() < 1e-6
    m = proj_ops._meridian_arc(phi, a, e2)
    assert np.abs(y - 0.9996 * m).max() < 1e-6


def test_tmerc_spherical_limit_matches_closed_form():
    # Snyder 8-1..8-3: spherical TM closed form
    r = 6371000.0
    fwd, _ = proj_ops.tmerc({"lon_0": 15, "a": r, "f": 0})
    b = np.cos(PHI) * np.sin(LAM - 15 * D2R)
    x_ref = r / 2.0 * np.log((1 + b) / (1 - b))
    y_ref = r * (np.arctan2(np.tan(PHI), np.cos(LAM - 15 * D2R)))
    x, y = fwd(LAM, PHI)
    # series truncation: cm-level agreement within +-3 deg of the CM
    assert np.abs(x - x_ref).max() < 0.02
    assert np.abs(y - y_ref).max() < 0.02


def test_utm_zone_params_and_equator_anchor():
    fwd, inv = proj_ops.utm({"zone": 33, "ellps": "WGS84"})
    x, y = fwd(np.float64(15 * D2R), np.float64(0.0))
    assert abs(x - 500000.0) < 1e-6 and abs(y) < 1e-6
    _roundtrip(fwd, inv, LAM, PHI)
    fwd_s, _ = proj_ops.utm({"zone": 33, "south": "", "ellps": "WGS84"})
    xs, ys = fwd_s(np.float64(15 * D2R), np.float64(0.0))
    assert abs(ys - 10000000.0) < 1e-6


def test_utm_zone_validation():
    with pytest.raises(ValueError):
        proj_ops.utm({"zone": 0})


# ---------------------------------------------------------------------------
# lcc
# ---------------------------------------------------------------------------

LCC = {"lat_1": 48, "lat_2": 52, "lat_0": 50, "lon_0": 15,
       "x_0": 1000000, "y_0": 500000, "ellps": "GRS80"}


def test_lcc_roundtrip_conformal_and_origin():
    fwd, inv = proj_ops.lcc(LCC)
    _roundtrip(fwd, inv, LAM, PHI)
    _conformal(fwd, LAM, PHI, proj_ops.ellipsoid_params({"ellps": "GRS80"})[1])
    x, y = fwd(np.float64(15 * D2R), np.float64(50 * D2R))
    assert abs(x - 1000000.0) < 1e-6 and abs(y - 500000.0) < 1e-6


def test_lcc_unit_scale_at_standard_parallels():
    a, e2 = proj_ops.ellipsoid_params({"ellps": "GRS80"})
    fwd, _ = proj_ops.lcc(LCC)
    for deg in (48.0, 52.0):
        phi = deg * D2R
        h = 1e-7
        x0, y0 = fwd(np.float64(15 * D2R), np.float64(phi))
        x1, y1 = fwd(np.float64(15 * D2R + h), np.float64(phi))
        ds_proj = np.hypot(x1 - x0, y1 - y0)
        # true parallel arc for dlam = h: nu cos(phi) h
        nu = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
        ds_true = nu * np.cos(phi) * h
        assert abs(ds_proj / ds_true - 1.0) < 1e-6


def test_lcc_1sp():
    fwd, inv = proj_ops.lcc({"lat_1": 49, "lat_0": 49, "lon_0": 15,
                             "k_0": 0.9999, "ellps": "WGS84"})
    _roundtrip(fwd, inv, LAM, PHI)


# ---------------------------------------------------------------------------
# krovak
# ---------------------------------------------------------------------------

def test_krovak_roundtrip_and_conformal():
    fwd, inv = proj_ops.krovak({})
    _roundtrip(fwd, inv, LAM, PHI, tol=1e-8)
    _conformal(fwd, LAM, PHI,
               proj_ops.ellipsoid_params({"ellps": "bessel"})[1], rel=2e-5)


def test_krovak_prague_anchor_and_orientation():
    """Prague (14.42E 50.087N, Bessel datum close enough at 15 km
    tolerance): S-JTSK westing ~741 km, southing ~1044 km -> EPSG:5514
    x ~ -741e3, y ~ -1044e3. Catches sign, axis-order and deg/rad
    errors; the exact constants are covered by the invariant tests."""
    fwd, _ = proj_ops.krovak({})
    x, y = fwd(np.float64(14.42 * D2R), np.float64(50.087 * D2R))
    assert -760000 < x < -725000, x
    assert -1060000 < y < -1030000, y
    # east -> x grows (westing shrinks); north -> y grows
    x2, _ = fwd(np.float64(14.6 * D2R), np.float64(50.087 * D2R))
    _, y2 = fwd(np.float64(14.42 * D2R), np.float64(50.3 * D2R))
    assert x2 > x and y2 > y


def test_krovak_czech_flag_matches_proj_convention():
    """PROJ's +czech un-negates the default output and keeps the same
    axis assignment: x = westing, y = southing (positive)."""
    fwd, inv = proj_ops.krovak({})
    fwd_c, inv_c = proj_ops.krovak({"czech": ""})
    lam, phi = np.float64(14.42 * D2R), np.float64(50.087 * D2R)
    x, y = fwd(lam, phi)          # default: x=-westing, y=-southing
    xw, ys = fwd_c(lam, phi)
    assert abs(xw - (-x)) < 1e-9 and abs(ys - (-y)) < 1e-9
    assert 725000 < xw < 760000    # Prague westing ~741 km
    assert 1030000 < ys < 1060000  # Prague southing ~1044 km
    _roundtrip(fwd_c, inv_c, LAM, PHI, tol=1e-8)


def test_epsg_5513_axis_order_is_southing_westing():
    """EPSG:5513's registry axis order is (X=southing, Y=westing)."""
    f13, i13, _ = resolve_crs("EPSG:5513")
    f14, _, _ = resolve_crs("EPSG:5514")
    ref_x, ref_y = lonlat_to_mercator(14.42, 50.087)
    # derive the same point in both CRS and check the axis relation
    gx = f14(np.float64(-741000.0), np.float64(-1044000.0))
    g13 = f13(np.float64(1044000.0), np.float64(741000.0))
    assert abs(gx[0] - g13[0]) < 1e-6 and abs(gx[1] - g13[1]) < 1e-6
    a, b = i13(np.float64(ref_x), np.float64(ref_y))
    assert 1030000 < a < 1060000 and 725000 < b < 760000


def test_pipeline_steps_keep_bare_flags():
    """+south / +czech are presence flags — the step tokenizer must not
    drop them (a dropped +south is a 10,000 km northing error)."""
    from freemap_tiler_ray.proj_pipeline import parse_proj_pipeline
    f_pipe, _, _ = parse_proj_pipeline(
        "+proj=pipeline +step +inv +proj=utm +zone=33 +south +ellps=WGS84"
        " +step +proj=webmerc")
    f_bare, _, _ = parse_source_crs("+proj=utm +zone=33 +south +ellps=WGS84")
    pt = (np.float64(500000.0), np.float64(9000000.0))  # S hemisphere
    a = np.stack(f_pipe(*pt))
    b = np.stack(f_bare(*pt))
    assert np.abs(a - b).max() < 1e-6
    assert a[1] < 0                      # really south of the equator


def test_longlat_source_without_shift_is_separable():
    f, i, sep = parse_source_crs("+proj=longlat +ellps=WGS84")
    assert sep                            # fast per-axis warp path
    x, y = f(np.float64(15.0), np.float64(50.0))
    rx, ry = lonlat_to_mercator(15.0, 50.0)
    assert abs(x - rx) < 1e-9 and abs(y - ry) < 1e-9


def test_utm_missing_zone_is_valueerror():
    with pytest.raises(ValueError, match="zone"):
        proj_ops.utm({"ellps": "WGS84"})
    with pytest.raises(ValueError, match="zone"):
        parse_source_crs("+proj=utm +ellps=WGS84")


# ---------------------------------------------------------------------------
# towgs84 datum shift
# ---------------------------------------------------------------------------

def test_towgs84_roundtrip_and_identity():
    # round-trip residual is the h=0 re-projection approximation:
    # ~1e-10 rad (mm) for this shift — far below any source pixel
    sh = proj_ops.towgs84({"ellps": "bessel", "x": 589, "y": 76, "z": 480})
    _roundtrip(sh[0], sh[1], LAM, PHI, tol=1e-8)
    ident = proj_ops.towgs84({"ellps": "WGS84"})
    lam2, phi2 = ident[0](LAM, PHI)
    assert np.abs(lam2 - LAM).max() < 1e-15
    assert np.abs(phi2 - PHI).max() < 1e-15


def test_towgs84_pure_translation_magnitude():
    """A +x=100 shift moves a point on the equator/prime meridian by
    ~100 m radially -> latitude unchanged, height absorbed: the
    horizontal displacement there is ~0; at 90E the same shift is all
    longitude. Sanity-check both directions."""
    sh = proj_ops.towgs84({"ellps": "WGS84", "x": 100})
    lam, phi = sh[0](np.float64(0.0), np.float64(0.0))
    assert abs(lam) < 1e-9 and abs(phi) < 1e-9   # radial -> no horiz
    lam2, phi2 = sh[0](np.float64(np.pi / 2), np.float64(0.0))
    # at 90E, +x is tangential westward: dlam ~ -100 / a
    assert abs(lam2 - (np.pi / 2 - 100.0 / 6378137.0)) < 1e-9
    assert abs(phi2) < 1e-9


def test_towgs84_seven_param_roundtrip():
    sh = proj_ops.towgs84({"ellps": "bessel", "x": 589, "y": 76, "z": 480,
                           "rx": 1.2, "ry": -0.8, "rz": 2.5, "s": 5.66})
    _roundtrip(sh[0], sh[1], LAM, PHI, tol=1e-8)


# ---------------------------------------------------------------------------
# source-CRS strings, EPSG table, pipeline-step parity
# ---------------------------------------------------------------------------

def test_bare_utm_source_crs_matches_pipeline_composition():
    f1, i1, sep1 = parse_source_crs("+proj=utm +zone=33 +ellps=WGS84")
    f2, i2, sep2 = resolve_crs(
        "+proj=pipeline +step +inv +proj=utm +zone=33 +ellps=WGS84"
        " +step +proj=webmerc")
    assert not sep1 and not sep2
    fwd_u, _ = proj_ops.utm({"zone": 33, "ellps": "WGS84"})
    x_utm, y_utm = fwd_u(LAM, PHI)
    a1 = np.stack(f1(x_utm, y_utm))
    a2 = np.stack(f2(x_utm, y_utm))
    assert np.abs(a1 - a2).max() < 1e-6
    # and the composition really lands on EPSG:3857 (sub-mm: the tmerc
    # inverse series truncates at ~0.6 mm at the +-3 deg zone edge)
    ref = np.stack(lonlat_to_mercator(LAM / D2R, PHI / D2R))
    assert np.abs(a1 - ref).max() < 0.005
    b1 = np.stack(i1(*f1(x_utm, y_utm)))
    assert np.abs(b1 - np.stack([x_utm, y_utm])).max() < 0.005


def test_epsg_lookup_table():
    f_utm, _, _ = resolve_crs("EPSG:32633")
    f_bare, _, _ = parse_source_crs("+proj=utm +zone=33 +ellps=WGS84")
    fwd_u, _ = proj_ops.utm({"zone": 33, "ellps": "WGS84"})
    x, y = fwd_u(LAM, PHI)
    assert np.abs(np.stack(f_utm(x, y)) - np.stack(f_bare(x, y))).max() \
        < 1e-9
    f_sjtsk, i_sjtsk, _ = resolve_crs("EPSG:5514")
    # Prague through the full 5514 -> 3857 chain lands near its
    # known Web Mercator position (datum shift included)
    ref_x, ref_y = lonlat_to_mercator(14.42, 50.087)
    fwd_k, _ = proj_ops.krovak({})
    # 5514 coords of (approximately) Prague on the Bessel datum: derive
    # them through the inverse chain, then forward must round-trip
    x5514, y5514 = i_sjtsk(np.float64(ref_x), np.float64(ref_y))
    gx, gy = f_sjtsk(x5514, y5514)
    # chain round-trip through the h=0 datum-shift approximation: cm
    assert abs(gx - ref_x) < 0.02 and abs(gy - ref_y) < 0.02
    with pytest.raises(ValueError):
        resolve_crs("EPSG:99999")


def test_longlat_source_crs_with_datum_shift():
    f, i, _ = parse_source_crs(
        "+proj=longlat +ellps=bessel +towgs84=589,76,480")
    x, y = f(np.float64(14.42), np.float64(50.087))
    # vs the no-shift path: the S-JTSK shift moves things by ~100-200 m
    x0, y0 = lonlat_to_mercator(14.42, 50.087)
    d = np.hypot(x - x0, y - y0)
    assert 10.0 < d < 1000.0
    lam2, phi2 = i(x, y)
    # h=0 approximation -> ~5 cm (7e-9 rad) round-trip residual
    assert abs(lam2 - 14.42) < 5e-8 and abs(phi2 - 50.087) < 5e-8


def test_unsupported_source_crs_raises():
    with pytest.raises(ValueError):
        parse_source_crs("+proj=omerc +lat_0=4 +lonc=115")
    with pytest.raises(ValueError):
        parse_source_crs("+ellps=WGS84")


# ---------------------------------------------------------------------------
# e2e: warp a scene whose SRS is a real projected CRS (grid-warp path)
# ---------------------------------------------------------------------------

def _constant_scene(tmp_path, name: str, crs: str, anchor, size=384,
                    color=(120, 200, 40, 255)):
    """Scene regular in `crs`, covering the anchor megatile's EPSG:3857
    bounds with margin, filled with one constant color (Lanczos of a
    constant is that constant, so warped interiors must equal it)."""
    from freemap_tiler_ray import tilemath as tm
    from freemap_tiler_ray.raster import SceneSpec

    _, inv, _ = resolve_crs(crs)
    bx0, by0, bx1, by1 = tm.bounds(*anchor)
    mx = 0.25 * (bx1 - bx0)
    cx = np.array([bx0 - mx, bx1 + mx, bx0 - mx, bx1 + mx,
                   (bx0 + bx1) / 2, (bx0 + bx1) / 2])
    cy = np.array([by0 - mx, by0 - mx, by1 + mx, by1 + mx,
                   by0 - mx, by1 + mx])
    sx, sy = inv(cx, cy)
    x0, x1 = float(sx.min()), float(sx.max())
    y0, y1 = float(sy.min()), float(sy.max())
    img = np.empty((size, size, 4), np.uint8)
    img[:] = np.array(color, np.uint8)
    path = str(tmp_path / f"{name}.npy")
    with open(path, "wb") as f:
        np.save(f, img)
    spec = SceneSpec(scene_id=name, path=path, width=size, height=size,
                     bands=4, crs=crs, origin_x=x0, origin_y=y1,
                     px_w=(x1 - x0) / size, px_h=(y1 - y0) / size)
    spec.save()
    return spec


@pytest.mark.parametrize("crs", ["EPSG:32633", "EPSG:5514",
                                 "+proj=lcc +lat_1=48 +lat_2=52 +lat_0=50"
                                 " +lon_0=15 +ellps=GRS80"])
def test_projected_source_scene_warps_exactly(tmp_path, crs):
    from freemap_tiler_ray.stages.warp import WarpStage

    anchor = (6, 34, 21)   # ~11.25-16.9 E, ~48.9-52.5 N (Czechia/Slovakia)
    spec = _constant_scene(tmp_path, crs.replace(":", "_")[:12], crs, anchor)
    assert not spec.crs_separable
    st = WarpStage(scene_spec_path=spec.path, tile_size=256,
                   warp_zoom_offset=2)
    mega = st._warp_one(*anchor)
    assert mega.shape == (1024, 1024, 4)
    assert (mega[:, :, 3] == 255).all()          # fully covered
    assert (mega[:, :, 0] == 120).all()
    assert (mega[:, :, 1] == 200).all()
    assert (mega[:, :, 2] == 40).all()


# ---------------------------------------------------------------------------
# property tests: round-trip closure over each projection's whole domain
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# UTM33 domain: zone width +-3 deg plus the 2-deg overlap GIS tools use
_lon = st.floats(min_value=10.0, max_value=20.0)
_lat = st.floats(min_value=-80.0, max_value=84.0)  # UTM latitude band


@settings(max_examples=80, deadline=None)
@given(_lon, _lat)
def test_utm_roundtrip_property(lon, lat):
    # 1e-8 rad ~ 6 cm: the Snyder series' truncation at the overlap edge
    fwd, inv = proj_ops.utm({"zone": 33, "ellps": "WGS84"})
    lam, phi = np.float64(lon * D2R), np.float64(lat * D2R)
    lam2, phi2 = inv(*fwd(lam, phi))
    assert abs(lam2 - lam) < 1e-8 and abs(phi2 - phi) < 1e-8


@settings(max_examples=80, deadline=None)
@given(st.floats(min_value=-30.0, max_value=60.0),
       st.floats(min_value=20.0, max_value=75.0))
def test_lcc_roundtrip_property(lon, lat):
    fwd, inv = proj_ops.lcc(LCC)
    lam, phi = np.float64(lon * D2R), np.float64(lat * D2R)
    lam2, phi2 = inv(*fwd(lam, phi))
    assert abs(lam2 - lam) < 1e-9 and abs(phi2 - phi) < 1e-9


@settings(max_examples=80, deadline=None)
@given(st.floats(min_value=10.0, max_value=24.0),
       st.floats(min_value=46.0, max_value=53.0))
def test_krovak_roundtrip_property(lon, lat):
    """S-JTSK's domain of use (Czechia + Slovakia, generously padded)."""
    fwd, inv = proj_ops.krovak({})
    lam, phi = np.float64(lon * D2R), np.float64(lat * D2R)
    lam2, phi2 = inv(*fwd(lam, phi))
    assert abs(lam2 - lam) < 1e-8 and abs(phi2 - phi) < 1e-8


@settings(max_examples=60, deadline=None)
@given(st.floats(min_value=-179.0, max_value=179.0),
       st.floats(min_value=-85.0, max_value=85.0),
       st.floats(min_value=-1000.0, max_value=1000.0),
       st.floats(min_value=-1000.0, max_value=1000.0),
       st.floats(min_value=-1000.0, max_value=1000.0))
def test_towgs84_roundtrip_property(lon, lat, dx, dy, dz):
    # h=0 re-projection residual scales with |shift| and latitude:
    # worst observed corner (lat 78, |shift| ~1.5 km: dx=855 dy=854
    # dz=-943) reaches 2.0e-7 rad (~1.3 m) — still far inside a
    # 3-param Helmert's own ~1-5 m accuracy, so bound at 5e-7 rad
    sh = proj_ops.towgs84({"ellps": "bessel", "x": dx, "y": dy, "z": dz})
    lam, phi = np.float64(lon * D2R), np.float64(lat * D2R)
    lam2, phi2 = sh[1](*sh[0](lam, phi))
    assert abs(lam2 - lam) < 5e-7 and abs(phi2 - phi) < 5e-7


# ---------------------------------------------------------------------------
# merc (ellipsoidal), stere (polar), laea, aea
# ---------------------------------------------------------------------------

def _area_scale(fwd, lam, phi, a, e2):
    """|det J| of an equal-area map must equal the true area element
    M(phi) N(phi) cos(phi) (meridian x prime-vertical curvature radii)."""
    h = 1e-7
    x0, y0 = fwd(lam, phi)
    xl, yl = fwd(lam + h, phi)
    xp, yp = fwd(lam, phi + h)
    det = ((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0)) / (h * h)
    s2 = 1.0 - e2 * np.sin(phi) ** 2
    m_r = a * (1.0 - e2) / s2 ** 1.5
    n_r = a / np.sqrt(s2)
    return np.abs(det) / (m_r * n_r * np.cos(phi))


def test_merc_ellipsoidal_roundtrip_conformal_and_limits():
    fwd, inv = proj_ops.merc_ell({"ellps": "WGS84"})
    _roundtrip(fwd, inv, LAM, PHI)
    _conformal(fwd, LAM, PHI,
               proj_ops.ellipsoid_params({"ellps": "WGS84"})[1])
    # equator anchor + spherical limit: with f=0 it IS webmerc
    x, y = fwd(np.float64(0.25), np.float64(0.0))
    assert abs(x - 6378137.0 * 0.25) < 1e-6 and abs(y) < 1e-6
    fs, _ = proj_ops.merc_ell({"a": 6378137.0, "f": 0})
    xs, ys = fs(LAM, PHI)
    rx, ry = lonlat_to_mercator(LAM / D2R, PHI / D2R)
    assert np.abs(xs - rx).max() < 1e-6 and np.abs(ys - ry).max() < 1e-6


def test_stere_polar_roundtrip_and_anchors():
    fwd, inv = proj_ops.stere({"lat_0": 90, "lat_ts": 70, "lon_0": -45,
                               "ellps": "WGS84"})
    x, y = fwd(np.float64(0.0), np.float64(np.pi / 2.0))
    assert abs(x) < 1e-6 and abs(y) < 1e-6         # pole at the origin
    lat_n = np.linspace(55.0, 89.5, 8) * D2R
    lon_n = np.linspace(-170.0, 170.0, 9) * D2R
    ln, pn = (g.ravel() for g in np.meshgrid(lon_n, lat_n))
    # compare longitudes modulo 2 pi (inv's atan2 wraps at lon_0 +- pi)
    x, y = fwd(ln, pn)
    l2, p2 = inv(x, y)
    dl = np.abs((l2 - ln + np.pi) % (2 * np.pi) - np.pi)
    assert dl.max() < 1e-9 and np.abs(p2 - pn).max() < 1e-9
    _conformal(fwd, ln, pn,
               proj_ops.ellipsoid_params({"ellps": "WGS84"})[1])
    # scale = 1 at lat_ts: a parallel arc keeps its true length there
    h = 1e-7
    x0, y0 = fwd(np.float64(0.1), np.float64(70 * D2R))
    x1, y1 = fwd(np.float64(0.1 + h), np.float64(70 * D2R))
    a, e2 = proj_ops.ellipsoid_params({"ellps": "WGS84"})
    nu = a / np.sqrt(1 - e2 * np.sin(70 * D2R) ** 2)
    assert abs(np.hypot(x1 - x0, y1 - y0) / (nu * np.cos(70 * D2R) * h)
               - 1.0) < 1e-6


def test_stere_south_and_oblique_rejection():
    fwd, inv = proj_ops.stere({"lat_0": -90, "lat_ts": -71, "lon_0": 0,
                               "ellps": "WGS84"})
    lat_s = np.linspace(-89.5, -55.0, 8) * D2R
    lon_s = np.linspace(-170.0, 170.0, 9) * D2R
    ls, ps = (g.ravel() for g in np.meshgrid(lon_s, lat_s))
    x, y = fwd(ls, ps)
    l2, p2 = inv(x, y)
    dl = np.abs((l2 - ls + np.pi) % (2 * np.pi) - np.pi)
    assert dl.max() < 1e-9 and np.abs(p2 - ps).max() < 1e-9
    with pytest.raises(ValueError, match="polar"):
        proj_ops.stere({"lat_0": 52})


def test_laea_equal_area_and_epsg3035_anchor():
    a, e2 = proj_ops.ellipsoid_params({"ellps": "GRS80"})
    p3035 = {"lat_0": 52, "lon_0": 10, "x_0": 4321000, "y_0": 3210000,
             "ellps": "GRS80"}
    fwd, inv = proj_ops.laea(p3035)
    x, y = fwd(np.float64(10 * D2R), np.float64(52 * D2R))
    assert abs(x - 4321000.0) < 1e-6 and abs(y - 3210000.0) < 1e-6
    lon_e = np.linspace(-10.0, 30.0, 9) * D2R
    lat_e = np.linspace(35.0, 70.0, 8) * D2R
    le, pe = (g.ravel() for g in np.meshgrid(lon_e, lat_e))
    _roundtrip(fwd, inv, le, pe, tol=1e-8)
    ratio = _area_scale(fwd, le, pe, a, e2)
    assert np.abs(ratio - 1.0).max() < 1e-5       # EXACTLY equal-area


def test_aea_equal_area_and_epsg5070_anchor():
    a, e2 = proj_ops.ellipsoid_params({"ellps": "GRS80"})
    p5070 = {"lat_1": 29.5, "lat_2": 45.5, "lat_0": 23, "lon_0": -96,
             "ellps": "GRS80"}
    fwd, inv = proj_ops.aea(p5070)
    x, y = fwd(np.float64(-96 * D2R), np.float64(23 * D2R))
    assert abs(x) < 1e-6 and abs(y) < 1e-6
    lon_u = np.linspace(-125.0, -66.0, 9) * D2R
    lat_u = np.linspace(24.0, 50.0, 8) * D2R
    lu, pu = (g.ravel() for g in np.meshgrid(lon_u, lat_u))
    _roundtrip(fwd, inv, lu, pu, tol=1e-8)
    ratio = _area_scale(fwd, lu, pu, a, e2)
    assert np.abs(ratio - 1.0).max() < 1e-5


def test_new_epsg_codes_resolve_and_roundtrip():
    for code, lon, lat in [("EPSG:3395", 15.0, 50.0),
                           ("EPSG:3035", 10.0, 52.0),
                           ("EPSG:5070", -96.0, 40.0),
                           ("EPSG:3413", -45.0, 75.0),
                           ("EPSG:3031", 0.0, -75.0),
                           ("EPSG:3976", 0.0, -75.0)]:
        f, i, sep = resolve_crs(code)
        rx, ry = lonlat_to_mercator(lon, lat)
        sx, sy = i(np.float64(rx), np.float64(ry))
        gx, gy = f(sx, sy)
        assert abs(gx - rx) < 0.01 and abs(gy - ry) < 0.01, code


def test_merc_pipeline_step_ellipsoidal_vs_spherical():
    from freemap_tiler_ray.proj_pipeline import parse_proj_pipeline
    f_ell, _, sep = parse_proj_pipeline(
        "+proj=pipeline +step +proj=merc +ellps=WGS84")
    assert sep                             # x(lam), y(phi) per-axis
    f_sph, _, _ = parse_proj_pipeline(
        "+proj=pipeline +step +proj=merc +R=6378137")
    lam, phi = np.float64(0.3), np.float64(0.9)
    ye = f_ell(lam, phi)[1]
    ys = f_sph(lam, phi)[1]
    assert abs(ye - ys) > 10000            # ellipsoidal y differs by ~0.3%

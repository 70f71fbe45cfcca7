"""Verbatim PROJ pipeline string support (subset, from scratch).

The reference passes `--transform-pipeline "<proj string>"` straight to
GDAL/PROJ (/root/reference/src/args.rs:37-43, warp.rs:22-58). This
sandbox has no PROJ, so this module parses the common subset of
`+proj=pipeline` strings directly into the engine's (fwd, inv,
separable) transform triple — the same contract `geo.resolve_crs`
returns for EPSG built-ins and `pipeline:module:function` factories.

Grammar (PROJ 9 syntax):
    +proj=pipeline [+step [+inv] +proj=NAME [+key=val ...]]...

Supported step operations:
    noop / longlat   identity (longlat is the pipeline's CRS cap — a
                     coordinate no-op once units are handled)
    unitconvert      +xy_in=deg|rad +xy_out=deg|rad
    axisswap         +order=2,1 (also signed: -2,1 / 2,-1 ...)
    webmerc / merc   spherical Web Mercator, +R= or +a= (default
                     6378137); merc WITH an ellipsoid (+ellps/+rf/+f/+b)
                     is the conformal ellipsoidal Mercator (EPSG:3395)
    affine           +xoff/+yoff/+s11/+s12/+s21/+s22 (defaults: offsets
                     0, matrix identity)
    tmerc / utm / lcc / krovak / stere / laea / aea / towgs84
                     ellipsoidal projections + Helmert datum shift
                     (proj_ops.py — Snyder / EPSG formulas)

Every step carries its own exact inverse; `+inv` swaps a step's
directions, and the pipeline inverse applies inverted steps in reverse
order. Separability (dst x depends only on src x, dst y only on src y —
what lets the warp use the fast per-axis tap path) holds iff every step
is separable; axisswap and affine cross terms force the grid-warp path,
exactly like any rotated PROJ pipeline under GDAL.

Unsupported operations raise ValueError naming the step, rather than
silently warping wrong.
"""

from __future__ import annotations

import numpy as np

_R_DEFAULT = 6378137.0
_D2R = np.pi / 180.0


def _parse_tokens(s: str) -> list[dict]:
    """Split a PROJ string into step dicts: [{'proj': ..., 'inv': bool,
    params: {...}}, ...]. The leading +proj=pipeline is validated."""
    toks = s.split()
    if not toks or toks[0].lstrip("+") != "proj=pipeline":
        raise ValueError("not a +proj=pipeline string")
    steps: list[dict] = []
    cur: dict | None = None
    for tok in toks[1:]:
        t = tok.lstrip("+")
        if t == "step":
            cur = {"proj": None, "inv": False, "params": {}}
            steps.append(cur)
            continue
        if cur is None:
            continue                       # global params (+ellps=...) ignored
        if t == "inv":
            cur["inv"] = True
        elif "=" in t:
            k, v = t.split("=", 1)
            if k == "proj":
                cur["proj"] = v
            else:
                cur["params"][k] = v
        else:
            # bare flags (+south, +czech, +no_defs, ...) are presence
            # params — dropping them would silently garble utm/krovak
            cur["params"][t] = ""
    for st in steps:
        if st["proj"] is None:
            raise ValueError("pipeline +step without +proj=")
    return steps


def _step_transform(proj: str, p: dict):
    """-> (fwd, inv, separable) for one step operation."""
    if proj in ("noop", "longlat", "lonlat", "latlong"):
        ident = lambda x, y: (np.asarray(x, np.float64),  # noqa: E731
                              np.asarray(y, np.float64))
        return ident, ident, True

    if proj == "unitconvert":
        xin = p.get("xy_in", "rad")
        xout = p.get("xy_out", "rad")
        f = {"deg": _D2R, "rad": 1.0}
        if xin not in f or xout not in f:
            raise ValueError(f"unitconvert units {xin}->{xout} not supported"
                             " (deg/rad only)")
        k = f[xin] / f[xout]

        def fwd(x, y, k=k):
            return np.asarray(x, np.float64) * k, np.asarray(y, np.float64) * k

        def inv(x, y, k=k):
            return np.asarray(x, np.float64) / k, np.asarray(y, np.float64) / k
        return fwd, inv, True

    if proj == "axisswap":
        order = p.get("order", "2,1")
        try:
            o1, o2 = (int(v) for v in order.split(","))
        except Exception:
            raise ValueError(f"axisswap order {order!r} not supported")
        if {abs(o1), abs(o2)} != {1, 2}:
            raise ValueError(f"axisswap order {order!r} not supported")
        s1, s2 = float(np.sign(o1)), float(np.sign(o2))

        def fwd(x, y, o1=abs(o1), s1=s1, s2=s2):
            x = np.asarray(x, np.float64)
            y = np.asarray(y, np.float64)
            a, b = (x, y) if o1 == 1 else (y, x)
            return a * s1, b * s2

        def inv(x, y, o1=abs(o1), s1=s1, s2=s2):
            x = np.asarray(x, np.float64) * (1.0 / s1)
            y = np.asarray(y, np.float64) * (1.0 / s2)
            return (x, y) if o1 == 1 else (y, x)
        swap = abs(o1) != 1
        return fwd, inv, not swap

    if proj == "merc" and any(k in p for k in ("ellps", "rf", "f", "b")):
        # PROJ semantics: merc with an ellipsoid is the conformal
        # ellipsoidal Mercator (EPSG:3395 family); webmerc / merc+R
        # stay spherical
        from . import proj_ops
        f, i = proj_ops.merc_ell(p)
        return f, i, True                 # x(lam) only, y(phi) only

    if proj in ("webmerc", "merc"):
        R = float(p.get("R", p.get("a", _R_DEFAULT)))

        def fwd(lam, phi, R=R):            # radians in
            lam = np.asarray(lam, np.float64)
            phi = np.asarray(phi, np.float64)
            return R * lam, R * np.log(np.tan(np.pi / 4.0 + phi / 2.0))

        def inv(x, y, R=R):
            x = np.asarray(x, np.float64)
            y = np.asarray(y, np.float64)
            return x / R, 2.0 * np.arctan(np.exp(y / R)) - np.pi / 2.0
        return fwd, inv, True

    if proj == "affine":
        xoff = float(p.get("xoff", 0.0))
        yoff = float(p.get("yoff", 0.0))
        s11 = float(p.get("s11", 1.0))
        s12 = float(p.get("s12", 0.0))
        s21 = float(p.get("s21", 0.0))
        s22 = float(p.get("s22", 1.0))
        det = s11 * s22 - s12 * s21
        if det == 0.0:
            raise ValueError("affine matrix is singular")

        def fwd(x, y):
            x = np.asarray(x, np.float64)
            y = np.asarray(y, np.float64)
            return xoff + s11 * x + s12 * y, yoff + s21 * x + s22 * y

        def inv(x, y):
            dx = np.asarray(x, np.float64) - xoff
            dy = np.asarray(y, np.float64) - yoff
            return ((s22 * dx - s12 * dy) / det,
                    (-s21 * dx + s11 * dy) / det)
        return fwd, inv, s12 == 0.0 and s21 == 0.0

    if proj in ("tmerc", "utm", "lcc", "krovak", "towgs84",
                "stere", "laea", "aea"):
        # ellipsoidal projections + datum shift (proj_ops): geodetic
        # radians <-> projected meters; all are non-separable (x and y
        # both depend on lon AND lat) except the datum shift, whose
        # cross-coupling is ~1e-5 — still treated as non-separable for
        # correctness
        from . import proj_ops
        f, i = getattr(proj_ops, proj)(p)
        return f, i, False

    raise ValueError(f"unsupported pipeline step +proj={proj} (supported: "
                     "noop longlat unitconvert axisswap webmerc merc affine "
                     "tmerc utm lcc krovak towgs84 stere laea aea)")


# EPSG code -> bare proj string, for the codes the reference's real
# inputs use (a miniature proj.db: UTM north/south, ETRS89/UTM, S-JTSK).
# The S-JTSK +towgs84 is EPSG transformation 1622 (S-JTSK to WGS 84 (1)).
def _epsg_to_proj(code: int) -> str | None:
    if 32601 <= code <= 32660:
        return f"+proj=utm +zone={code - 32600} +ellps=WGS84"
    if 32701 <= code <= 32760:
        return f"+proj=utm +zone={code - 32700} +south +ellps=WGS84"
    if 25828 <= code <= 25838:
        return f"+proj=utm +zone={code - 25800} +ellps=GRS80"
    if code == 5514:
        return "+proj=krovak +ellps=bessel +towgs84=589,76,480"
    if code == 5513:
        return "+proj=krovak +czech +ellps=bessel +towgs84=589,76,480"
    if code == 3395:                       # World Mercator (WGS84)
        return "+proj=merc +ellps=WGS84"
    if code == 3035:                       # ETRS89-extended / LAEA Europe
        return ("+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 "
                "+y_0=3210000 +ellps=GRS80")
    if code == 5070:                       # NAD83 / Conus Albers
        # NAD83 treated as WGS84-equivalent (~1 m), standard practice
        return ("+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 "
                "+lon_0=-96 +ellps=GRS80")
    if code == 3413:                       # NSIDC Sea Ice Polar Stereo N
        return "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +ellps=WGS84"
    if code == 3031:                       # Antarctic Polar Stereographic
        return "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +ellps=WGS84"
    if code == 3976:                       # NSIDC Sea Ice Polar Stereo S
        return "+proj=stere +lat_0=-90 +lat_ts=-70 +lon_0=0 +ellps=WGS84"
    return None


def parse_source_crs(s: str):
    """Bare (non-pipeline) '+proj=NAME +key=val ...' source-CRS string ->
    (fwd, inv, separable) with fwd: source coords -> EPSG:3857, the
    resolve_crs contract (the reference feeds such strings to GDAL as
    the source SRS, main.rs:80). Composition: inverse projection ->
    optional +towgs84 datum shift -> spherical Web Mercator. 'longlat'
    sources are degrees (PROJ's bare-CRS convention)."""
    from . import proj_ops

    toks = s.split()
    params: dict[str, str] = {}
    proj = None
    for tok in toks:
        t = tok.lstrip("+")
        if "=" in t:
            k, v = t.split("=", 1)
            params[k] = v
            if k == "proj":
                proj = v
        else:
            params[t] = ""                 # bare flags: +south, +czech
    if proj is None:
        raise ValueError(f"source CRS {s!r} has no +proj=")
    if proj == "pipeline":
        return parse_proj_pipeline(s)

    shift = None
    if "towgs84" in params and params["towgs84"]:
        vals = [float(v) for v in params["towgs84"].split(",")]
        if len(vals) not in (3, 7):
            raise ValueError("+towgs84 takes 3 or 7 values")
        keys = ["x", "y", "z", "rx", "ry", "rz", "s"]
        sp = dict(zip(keys, vals))
        sp.update({k: params[k] for k in ("ellps", "a", "rf", "f", "b")
                   if k in params})
        shift = proj_ops.towgs84(sp)

    d2r = np.pi / 180.0
    if proj in ("longlat", "lonlat", "latlong"):
        p_fwd = lambda x, y: (np.asarray(x, np.float64) * d2r,  # noqa: E731
                              np.asarray(y, np.float64) * d2r)
        p_inv = lambda x, y: (np.asarray(x, np.float64) / d2r,  # noqa: E731
                              np.asarray(y, np.float64) / d2r)
    elif proj in ("tmerc", "utm", "lcc", "krovak", "stere", "laea",
                  "aea", "merc"):
        fn = proj_ops.merc_ell if proj == "merc" else getattr(proj_ops,
                                                              proj)
        prj_fwd, prj_inv = fn(params)
        p_fwd, p_inv = prj_inv, prj_fwd    # source -> geodetic radians
    else:
        raise ValueError(f"unsupported source CRS +proj={proj} (supported:"
                         " longlat tmerc utm lcc krovak stere laea aea"
                         " merc, or a +proj=pipeline string)")

    wm_fwd, wm_inv, _ = _step_transform("webmerc", {})

    def fwd(x, y):
        lam, phi = p_fwd(x, y)
        if shift is not None:
            lam, phi = shift[0](lam, phi)
        return wm_fwd(lam, phi)

    def inv(x, y):
        lam, phi = wm_inv(x, y)
        if shift is not None:
            lam, phi = shift[1](lam, phi)
        return p_inv(lam, phi)

    # deg->rad->webmerc without a datum shift is per-axis (identical to
    # the EPSG:4326 builtin); projections and shifts cross-couple x/y
    separable = (shift is None
                 and proj in ("longlat", "lonlat", "latlong"))
    return fwd, inv, separable


def resolve_epsg(name: str):
    """'EPSG:NNNN' -> (fwd, inv, separable) via the miniature proj.db
    above, or None if the code isn't in it (geo.resolve_crs handles
    4326/3857 natively before asking here)."""
    try:
        code = int(name.split(":", 1)[1])
    except (IndexError, ValueError):
        return None
    s = _epsg_to_proj(code)
    if s is None:
        return None
    got = parse_source_crs(s)
    if code == 5513:
        # EPSG:5513's official axis order is (X=southing, Y=westing),
        # while PROJ's +czech output is (westing, southing) — swap at
        # the boundary so 5513-referenced coordinates read as defined
        f0, i0, _ = got

        def fwd(x, y):
            return f0(y, x)

        def inv(x, y):
            a, b = i0(x, y)
            return b, a
        got = (fwd, inv, False)
    return got


def parse_proj_pipeline(s: str):
    """PROJ pipeline string -> (fwd, inv, separable), the resolve_crs
    transform contract. fwd applies the steps left to right; inv applies
    each step's inverse right to left."""
    steps = _parse_tokens(s)
    chain = []
    separable = True
    for st in steps:
        f, i, sep = _step_transform(st["proj"], st["params"])
        if st["inv"]:
            f, i = i, f
        chain.append((f, i))
        separable = separable and sep

    def fwd(x, y, chain=tuple(chain)):
        for f, _ in chain:
            x, y = f(x, y)
        return x, y

    def inv(x, y, chain=tuple(chain)):
        for _, i in reversed(chain):
            x, y = i(x, y)
        return x, y
    return fwd, inv, separable

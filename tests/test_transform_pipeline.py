"""Pluggable-transform (pipeline CRS) conformance — the sandbox analog
of the reference's --transform-pipeline PROJ strings (args.rs:37-43,
warp.rs:22-58): a 'pipeline:module:function' CRS resolves to callable
pairs in every process, and non-separable transforms take the full-grid
warp path.

Grid-path output is compared against the separable path: weights are
mathematically identical (product of per-axis kernels, renormalized),
so after u8 rounding at most off-by-one from float summation order.
"""

import dataclasses
import os

import numpy as np

from freemap_tiler_ray import tilemath as tm
from freemap_tiler_ray.raster import SceneSpec, make_scene
from freemap_tiler_ray.stages.warp import WarpStage

ANCHOR = (4, 9, 5)
SIZE = 512


def _warp(spec, ts=256, offset=2):
    st = WarpStage(scene_spec_path=spec.path, tile_size=ts,
                   warp_zoom_offset=offset)
    return st._warp_one(*ANCHOR)


def _close(a, b, frac_exact=0.99):
    diff = np.abs(a.astype(np.int16) - b.astype(np.int16))
    assert diff.max() <= 1, f"max diff {diff.max()}"
    assert (diff == 0).mean() >= frac_exact, f"exact {(diff == 0).mean()}"


def _respec(spec: SceneSpec, new_path: str, **overrides) -> SceneSpec:
    """Second sidecar for the same pixels (WarpStage caches per path)."""
    if not os.path.exists(new_path):
        os.symlink(os.path.abspath(spec.path), new_path)
    s = dataclasses.replace(spec, path=new_path, **overrides)
    s.save()
    return s


def test_identity_pipeline_grid_path_matches_separable(tmp_path):
    spec = make_scene(str(tmp_path / "a"), anchor=ANCHOR, size=SIZE,
                      bands=4, crs="EPSG:3857", disk_frac=0.3)
    ref = _warp(spec)
    spec2 = _respec(
        spec, str(tmp_path / "a_ident.npy"),
        crs="pipeline:freemap_tiler_ray.transforms_demo:identity_grid")
    assert not spec2.crs_separable
    got = _warp(spec2)
    _close(ref, got)


def test_rot90_pipeline_nonseparable(tmp_path):
    spec = make_scene(str(tmp_path / "a"), anchor=ANCHOR, size=SIZE,
                      bands=4, crs="EPSG:3857", disk_frac=0.3)
    ref = _warp(spec)

    # scene in the rotated frame: B[r, c] = A[SIZE-1-c, r]
    img = np.load(spec.path)
    rot = np.ascontiguousarray(img.transpose(1, 0, 2)[:, ::-1])
    rot_path = str(tmp_path / "b.npy")
    with open(rot_path, "wb") as f:
        np.save(f, rot)
    bx0, by0, bx1, by1 = tm.bounds(*ANCHOR)
    cx, cy = (bx0 + bx1) / 2.0, (by0 + by1) / 2.0
    span = bx1 - bx0
    spec_b = SceneSpec(
        scene_id="rot", path=rot_path, width=SIZE, height=SIZE, bands=4,
        crs="pipeline:freemap_tiler_ray.transforms_demo:rot90_demo",
        origin_x=float(cx + by0 - cy), origin_y=float(cy + cx - bx0),
        px_w=float(span / SIZE), px_h=float(span / SIZE))
    spec_b.save()
    got = _warp(spec_b)
    _close(ref, got)


def test_pipeline_pyramid_build(ray_session, tmp_path):
    """End-to-end: build_pyramid over a pipeline-CRS scene produces the
    same decoded tiles as the EPSG:3857 build of the same pixels."""
    import pyarrow.parquet as pq

    from freemap_tiler_ray.config import TilerConfig
    from freemap_tiler_ray.pipelines.tiler import build_pyramid, parquet_files

    spec = make_scene(str(tmp_path / "s"), anchor=ANCHOR, size=256,
                      bands=4, crs="EPSG:3857", disk_frac=0.3)

    def run(sp, out):
        build_pyramid(TilerConfig(scene_spec_path=sp.path,
                                  out_dir=str(tmp_path / out), max_zoom=5,
                                  warp_zoom_offset=1, fmt="png",
                                  resume=False))
        dirs = [os.path.join(tmp_path, out, n)
                for n in sorted(os.listdir(tmp_path / out))
                if n.startswith(("level_z", "span_z"))]
        t = pq.read_table(parquet_files(dirs),
                          columns=["zoom", "x", "y", "status"]).to_pandas()
        return t.sort_values(["zoom", "x", "y"]).reset_index(drop=True)

    ref = run(spec, "o_ref")
    spec2 = _respec(
        spec, str(tmp_path / "s_ident.npy"),
        crs="pipeline:freemap_tiler_ray.transforms_demo:identity_grid")
    got = run(spec2, "o_pipe")
    assert got.equals(ref)

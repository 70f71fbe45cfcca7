"""Golden end-to-end pyramid build on the deterministic synthetic scene
(SURVEY.md §5 item 2, FIXTURES.md F2/F5).

The scene covers tile (4,9,5) exactly with a centered alpha disk of
radius 0.25*size, so tile assignment, per-tile status, and limits all
have closed-form oracles: a tile at zoom z >= 4 has data iff its pixel
square intersects the disk (nearest-point distance check); zooms < 4
contain the whole scene.
"""

import os

import numpy as np
import pytest

from freemap_tiler_ray import tilemath as tm
from freemap_tiler_ray.codecs import decode_tile
from freemap_tiler_ray.config import TilerConfig
from freemap_tiler_ray.pipelines.tiler import build_pyramid
from freemap_tiler_ray.raster import gradient_disk_pixels, make_scene
from freemap_tiler_ray.sources.mbtiles import (read_mbtiles_metadata,
                                               read_mbtiles_tiles)

ANCHOR = (4, 9, 5)
SIZE = 1024
MAX_ZOOM = 6
DISK = 0.25


def oracle_status(z, x, y):
    """closed-form: data iff tile's scene-pixel square intersects the disk."""
    scale = SIZE >> (z - 4) if z >= 4 else None  # scene px per tile axis
    if z < 4:
        return "data"
    # scene-local tile indices
    lx = x - (ANCHOR[1] << (z - 4))
    ly = y - (ANCHOR[2] << (z - 4))
    px0, py0 = lx * scale, ly * scale
    px1, py1 = px0 + scale - 1, py0 + scale - 1
    c, r = SIZE // 2, DISK * SIZE
    nx = min(max(c, px0), px1)
    ny = min(max(c, py0), py1)
    return "data" if (nx - c) ** 2 + (ny - c) ** 2 < r * r else "empty"


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("tiler")
    spec = make_scene(str(root / "scene"), anchor=ANCHOR, size=SIZE,
                      bands=4, crs="EPSG:3857", disk_frac=DISK)
    cfg = TilerConfig(scene_spec_path=spec.path, out_dir=str(root / "out"),
                      target_file=str(root / "out.mbtiles"),
                      max_zoom=MAX_ZOOM, warp_zoom_offset=3, fmt="png")
    res = build_pyramid(cfg)
    return root, spec, cfg, res


def expected_tiles():
    exp = {}
    for z in range(MAX_ZOOM, 3, -1):
        n = 1 << (z - 4)
        for x in range(ANCHOR[1] << (z - 4), (ANCHOR[1] << (z - 4)) + n):
            for y in range(ANCHOR[2] << (z - 4), (ANCHOR[2] << (z - 4)) + n):
                exp[(z, x, y)] = oracle_status(z, x, y)
    z, x, y = ANCHOR
    while True:
        exp[(z, x, y)] = "data"
        if z == 0:
            break
        z, x, y = z - 1, x >> 1, y >> 1
    return exp


def test_tile_set_and_status(built):
    import ray.data as rd
    root, spec, cfg, res = built
    got = {}
    from freemap_tiler_ray.pipelines.tiler import parquet_files
    ds = rd.read_parquet(parquet_files(res["tile_dirs"]),
                         columns=["zoom", "x", "y", "status"])
    for b in ds.iter_batches(batch_format="pandas"):
        for _, r in b.iterrows():
            got[(int(r["zoom"]), int(r["x"]), int(r["y"]))] = r["status"]
    assert got == expected_tiles()


def test_leaf_pixels_identity(built):
    """Warp grid aligns with source pixels at max_zoom -> decoded leaf
    pixels must equal the source sector exactly (alpha-masked)."""
    import ray.data as rd
    root, spec, cfg, res = built
    img = gradient_disk_pixels(SIZE, 4, DISK)
    masked = np.where(img[:, :, 3:4] > 0, img, 0)
    from freemap_tiler_ray.pipelines.tiler import parquet_files
    ds = rd.read_parquet(parquet_files(
        os.path.join(cfg.out_dir, f"level_z{MAX_ZOOM}")))
    n_checked = 0
    for b in ds.iter_batches(batch_format="pandas"):
        for _, r in b.iterrows():
            if r["status"] != "data" or int(r["zoom"]) != MAX_ZOOM:
                continue
            lx = int(r["x"]) - (ANCHOR[1] << (MAX_ZOOM - 4))
            ly = int(r["y"]) - (ANCHOR[2] << (MAX_ZOOM - 4))
            sec = masked[ly * 256:(ly + 1) * 256, lx * 256:(lx + 1) * 256]
            dec = decode_tile(r["tile_data"], r["tile_alpha"], "png", 256)
            np.testing.assert_array_equal(dec, sec,
                                          err_msg=f"tile {r['zoom']}/{r['x']}/{r['y']}")
            n_checked += 1
    assert n_checked > 0


def test_limits(built):
    root, spec, cfg, res = built
    exp = expected_tiles()
    limits = res["limits"]
    for z in range(MAX_ZOOM + 1):
        xs = [x for (zz, x, y), st in exp.items() if zz == z and st == "data"]
        tys = [int(tm.reversed_y(z, y)) for (zz, x, y), st in exp.items()
               if zz == z and st == "data"]
        assert limits[z] == {"min_x": min(xs), "max_x": max(xs),
                             "min_y": min(tys), "max_y": max(tys)}, f"zoom {z}"


def test_mbtiles_output(built):
    root, spec, cfg, res = built
    meta = read_mbtiles_metadata(str(root / "out.mbtiles"))
    assert meta["format"] == "png"
    assert meta["minzoom"] == "0" and meta["maxzoom"] == str(MAX_ZOOM)
    assert meta["name"] == "Tiles"
    assert "limits" in meta
    rows = read_mbtiles_tiles(str(root / "out.mbtiles"),
                              columns=("zoom_level", "tile_column", "tile_row"))
    exp = expected_tiles()
    exp_rows = {(z, x, int(tm.reversed_y(z, y))) for (z, x, y) in exp}
    assert set(rows) == exp_rows  # empty markers inserted too (K4)


def test_pyramid_pixels_match_sequential_reference(built):
    """Decoded pixels at EVERY level must equal a sequential in-process
    pyramid computed directly from the scene (independent of Ray's
    shuffle/ordering/quadrant bookkeeping; shares only the resampling
    kernel, which has its own unit tests)."""
    import ray.data as rd

    from freemap_tiler_ray.pipelines.tiler import parquet_files
    from freemap_tiler_ray.resample import downsample2x

    root, spec, cfg, res = built
    img = gradient_disk_pixels(SIZE, 4, DISK)
    masked = np.where(img[:, :, 3:4] > 0, img, 0)

    # sequential reference pyramid: dict zoom -> {(x, y): buf}
    ref = {MAX_ZOOM: {}}
    for lx in range(4):
        for ly in range(4):
            sec = masked[ly * 256:(ly + 1) * 256, lx * 256:(lx + 1) * 256]
            if sec[:, :, 3].any():
                ref[MAX_ZOOM][(36 + lx, 20 + ly)] = sec
    for z in range(MAX_ZOOM, 0, -1):
        ref[z - 1] = {}
        parents = {(x >> 1, y >> 1) for (x, y) in ref[z]}
        for px, py in parents:
            mosaic = np.zeros((512, 512, 4), np.uint8)
            for dx in range(2):
                for dy in range(2):
                    child = ref[z].get((2 * px + dx, 2 * py + dy))
                    if child is not None:
                        mosaic[dy * 256:(dy + 1) * 256,
                               dx * 256:(dx + 1) * 256] = child
            ref[z - 1][(px, py)] = downsample2x(mosaic)

    ds = rd.read_parquet(parquet_files(res["tile_dirs"]))
    n = 0
    for b in ds.iter_batches(batch_format="pandas"):
        for _, r in b.iterrows():
            if r["status"] != "data":
                continue
            exp = ref[int(r["zoom"])][(int(r["x"]), int(r["y"]))]
            dec = decode_tile(r["tile_data"], r["tile_alpha"], "png", 256)
            np.testing.assert_array_equal(
                dec, exp, err_msg=f"tile {r['zoom']}/{r['x']}/{r['y']}")
            n += 1
    assert n == sum(len(v) for v in ref.values())


def test_resume_noop(built, tmp_path):
    """Re-running with resume=True must skip all stages and reproduce the
    same summary (bulk anti-join leaves nothing to do)."""
    root, spec, cfg, res = built
    import dataclasses
    cfg2 = dataclasses.replace(cfg, resume=True)
    res2 = build_pyramid(cfg2)
    assert res2["limits"] == res["limits"]
    assert res2["metrics_sec"]["warp"] == 0.0

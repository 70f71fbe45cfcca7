"""Mosaic (VRT analog) e2e test."""
import numpy as np
import pytest

from freemap_tiler_ray import tilemath as tm
from freemap_tiler_ray.config import TilerConfig
from freemap_tiler_ray.pipelines.tiler import build_pyramid, parquet_files
from freemap_tiler_ray.raster import MosaicSpec, SceneSpec, make_scene
from freemap_tiler_ray.codecs import decode_tile


def test_mosaic_two_scenes(ray_session, tmp_path):
    """Two half-coverage members (west tile + east tile of z5 row) build
    the same pyramid region as one scene; overlay order = later wins."""
    import dataclasses
    # member A covers tile (5,18,10), member B covers (5,19,10):
    a = make_scene(str(tmp_path / "a"), anchor=(5, 18, 10), size=512,
                   bands=4, disk_frac=0.45)
    b = make_scene(str(tmp_path / "b"), anchor=(5, 19, 10), size=512,
                   bands=4, disk_frac=0.45)
    mos = MosaicSpec("mosaic", str(tmp_path / "m.mosaic.json"), [a, b])
    mos.save()
    cfg = TilerConfig(scene_spec_path=str(tmp_path / "m.mosaic.json"),
                      out_dir=str(tmp_path / "o"), max_zoom=6,
                      warp_zoom_offset=1, fmt="png")
    res = build_pyramid(cfg)
    import pyarrow.parquet as pq
    t = pq.read_table(parquet_files(res["tile_dirs"]),
                      columns=["zoom", "x", "y", "status"]).to_pandas()
    leaves = t[(t["zoom"] == 6)]
    # coverage spans both members: x 36..39 (A: 36-37, B: 38-39), y 20..21
    assert set(leaves["x"]) == {36, 37, 38, 39}
    assert set(leaves["y"]) == {20, 21}
    # pixel check: a data tile from member B matches B's own sector
    full = pq.read_table(parquet_files(res["tile_dirs"])).to_pandas()
    row = full[(full["zoom"] == 6) & (full["x"] == 38) & (full["y"] == 20)
               & (full["status"] == "data")]
    if len(row):
        from freemap_tiler_ray.raster import gradient_disk_pixels
        img = gradient_disk_pixels(512, 4, 0.45)
        masked = np.where(img[:, :, 3:4] > 0, img, 0)
        dec = decode_tile(row.iloc[0]["tile_data"], row.iloc[0]["tile_alpha"],
                          "png", 256)
        np.testing.assert_array_equal(dec, masked[:256, :256])

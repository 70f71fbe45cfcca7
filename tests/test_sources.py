"""Window-table raster source + MBTiles-import resume (Flow C parity)."""

import dataclasses
import os

import numpy as np
import pytest

from freemap_tiler_ray.config import TilerConfig
from freemap_tiler_ray.pipelines import checkpoint as ckpt
from freemap_tiler_ray.pipelines.tiler import build_pyramid
from freemap_tiler_ray.raster import gradient_disk_pixels, make_scene
from freemap_tiler_ray.sources.mbtiles import import_mbtiles_leaves
from freemap_tiler_ray.sources.raster_source import (scene_windows_dataset,
                                                     window_table_to_scene,
                                                     write_window_table)


def test_window_table_roundtrip(ray_session, tmp_path):
    spec = make_scene(str(tmp_path / "scene"), size=512, bands=4,
                      disk_frac=0.3)
    ds, (nwy, nwx) = scene_windows_dataset(spec, window=256)
    assert (nwy, nwx) == (2, 2)
    write_window_table(spec, str(tmp_path / "wt"), window=256)
    back = window_table_to_scene(str(tmp_path / "wt"), spec,
                                 str(tmp_path / "back"), window=256)
    a = np.load(spec.path)
    b = np.load(back.path)
    np.testing.assert_array_equal(a, b)


def test_import_mbtiles_resume(ray_session, tmp_path):
    """Build -> take the MBTiles -> resume a fresh out_dir from it; no
    megatile should be re-warped and the result must match."""
    spec = make_scene(str(tmp_path / "scene"), size=1024, bands=4,
                      disk_frac=0.25)
    cfg1 = TilerConfig(scene_spec_path=spec.path,
                       out_dir=str(tmp_path / "o1"),
                       target_file=str(tmp_path / "a.mbtiles"),
                       max_zoom=6, warp_zoom_offset=1)
    res1 = build_pyramid(cfg1)

    cfg2 = TilerConfig(scene_spec_path=spec.path,
                       out_dir=str(tmp_path / "o2"),
                       target_file=str(tmp_path / "b.mbtiles"),
                       max_zoom=6, warp_zoom_offset=1, resume=True)
    os.makedirs(cfg2.out_dir, exist_ok=True)
    man = import_mbtiles_leaves(str(tmp_path / "a.mbtiles"), cfg2, bands=4)
    assert ckpt.range_count(man["attempts"][0]["key_ranges"]) == 4  # all

    res2 = build_pyramid(cfg2)
    # resume added no new warp attempt beyond the import
    man2 = ckpt.load_manifest(cfg2.out_dir, "leaves")
    extra = [a for a in man2["attempts"][1:] if a.get("key_ranges")]
    assert not extra
    assert res2["limits"] == res1["limits"]
    from freemap_tiler_ray.sources.mbtiles import read_mbtiles_tiles
    r1 = sorted(read_mbtiles_tiles(str(tmp_path / "a.mbtiles")))
    r2 = sorted(read_mbtiles_tiles(str(tmp_path / "b.mbtiles")))
    assert [r[:3] for r in r1] == [r[:3] for r in r2]
    # leaf blobs byte-identical (reused, not re-encoded)
    z6_1 = [r for r in r1 if r[0] == 6]
    z6_2 = [r for r in r2 if r[0] == 6]
    assert z6_1 == z6_2

"""Pyramid variants: 2-band gray+alpha scene, JPEG format with
tile_alpha column, bounding-polygon coverage filter."""

import os
import sqlite3

import numpy as np
import pytest

from freemap_tiler_ray.codecs import decode_tile
from freemap_tiler_ray.config import TilerConfig
from freemap_tiler_ray.pipelines.tiler import build_pyramid
from freemap_tiler_ray.raster import make_scene
from freemap_tiler_ray.sources.mbtiles import (read_mbtiles_metadata,
                                               read_mbtiles_tiles)
from freemap_tiler_ray.stages.geom import regular_polygon
from freemap_tiler_ray import tilemath as tm


def test_gray_alpha_pyramid(ray_session, tmp_path):
    """band_count=2 path (processor.rs:86, La8 encode 543-562)."""
    spec = make_scene(str(tmp_path / "scene"), size=512, bands=2,
                      disk_frac=0.3)
    cfg = TilerConfig(scene_spec_path=spec.path, out_dir=str(tmp_path / "o"),
                      target_file=str(tmp_path / "o.mbtiles"),
                      max_zoom=5, warp_zoom_offset=1, fmt="png")
    res = build_pyramid(cfg)
    rows = read_mbtiles_tiles(str(tmp_path / "o.mbtiles"),
                              columns=("zoom_level", "tile_column",
                                       "tile_row", "tile_data"))
    data_rows = [r for r in rows if len(r[3])]
    assert data_rows
    dec = decode_tile(bytes(data_rows[0][3]), b"", "png", 256)
    assert dec.shape[2] == 2  # GA kept 2-band end to end


def test_jpeg_pyramid_with_alpha_column(ray_session, tmp_path):
    """JPEG format: tiles table gains tile_alpha (schema.rs:29-32);
    partially-transparent tiles carry an alpha blob, opaque ones don't
    (processor.rs:505-517)."""
    spec = make_scene(str(tmp_path / "scene"), size=512, bands=4,
                      disk_frac=0.3)
    cfg = TilerConfig(scene_spec_path=spec.path, out_dir=str(tmp_path / "o"),
                      target_file=str(tmp_path / "o.mbtiles"),
                      max_zoom=5, warp_zoom_offset=1, fmt="jpeg",
                      jpeg_quality=85)
    build_pyramid(cfg)
    conn = sqlite3.connect(str(tmp_path / "o.mbtiles"))
    cols = [r[1] for r in conn.execute("PRAGMA table_info(tiles)")]
    assert "tile_alpha" in cols
    rows = conn.execute("SELECT tile_data, tile_alpha FROM tiles").fetchall()
    conn.close()
    datas = [r for r in rows if len(r[0])]
    assert datas
    assert all(bytes(d[:2]) == b"\xff\xd8" for d, _ in datas)
    # the disk mask guarantees some translucent tiles -> nonempty alpha
    assert any(len(a) > 0 for _, a in datas)
    meta = read_mbtiles_metadata(str(tmp_path / "o.mbtiles"))
    assert meta["format"] == "jpeg"
    # roundtrip one tile with alpha
    d, a = next((d, a) for d, a in datas if len(a))
    dec = decode_tile(bytes(d), bytes(a), "jpeg", 256)
    assert dec.shape == (256, 256, 4)
    assert dec[:, :, 3].min() == 0 and dec[:, :, 3].max() == 255


def test_polygon_coverage_filter(ray_session, tmp_path):
    """Tiles outside the bounding polygon are never emitted
    (main.rs:183-199): restrict coverage to a triangle over the NW
    quadrant of the scene."""
    spec = make_scene(str(tmp_path / "scene"), size=1024, bands=4,
                      disk_frac=0.45)
    bx0, by0, bx1, by1 = tm.bounds(4, 9, 5)
    ring = np.array([[bx0, by1], [(bx0 + bx1) / 2, by1],
                     [bx0, (by0 + by1) / 2]])
    cfg = TilerConfig(scene_spec_path=spec.path, out_dir=str(tmp_path / "o"),
                      max_zoom=6, warp_zoom_offset=1,
                      bounding_polygon=ring)
    res = build_pyramid(cfg)
    import pyarrow.parquet as pq
    from freemap_tiler_ray.pipelines.tiler import parquet_files
    t = pq.read_table(parquet_files(res["tile_dirs"]),
                      columns=["zoom", "x", "y"]).to_pandas()
    leaves = t[t["zoom"] == 6]
    full = {(x, y) for x in range(36, 40) for y in range(20, 24)}
    got = {(r["x"], r["y"]) for _, r in leaves.iterrows()}
    assert got < full                       # strictly fewer tiles
    # NW corner tile must be in, SE corner out
    assert (36, 20) in got and (39, 23) not in got

def test_tiny_max_zoom_clamps_offset(ray_session, tmp_path):
    """max_zoom < warp_zoom_offset: offset clamps (config.effective_offset)
    and the pyramid still reaches zoom 0."""
    spec = make_scene(str(tmp_path / "scene"), size=256, bands=4,
                      disk_frac=0.45)
    cfg = TilerConfig(scene_spec_path=spec.path, out_dir=str(tmp_path / "o"),
                      target_file=str(tmp_path / "o.mbtiles"),
                      max_zoom=1, warp_zoom_offset=3, fmt="png")
    res = build_pyramid(cfg)
    rows = read_mbtiles_tiles(str(tmp_path / "o.mbtiles"),
                              columns=("zoom_level", "tile_column", "tile_row"))
    assert sorted({r[0] for r in rows}) == [0, 1]


def test_deferred_compaction_is_byte_identical(ray_session, tmp_path,
                                               monkeypatch):
    """FTR_MBT_DEFER=1 (writer runs only after the pyramid — the A/B
    control for the progressive-overlap writer) must produce an
    MBTiles byte-identical in content to the overlapped default."""
    spec = make_scene(str(tmp_path / "scene"), size=512, bands=4,
                      disk_frac=0.3)
    out = {}
    for mode, env in (("overlap", ""), ("defer", "1")):
        monkeypatch.setenv("FTR_MBT_DEFER", env)
        cfg = TilerConfig(scene_spec_path=spec.path,
                          out_dir=str(tmp_path / f"o_{mode}"),
                          target_file=str(tmp_path / f"{mode}.mbtiles"),
                          max_zoom=5, warp_zoom_offset=1, fmt="jpeg")
        build_pyramid(cfg)
        rows = read_mbtiles_tiles(
            str(tmp_path / f"{mode}.mbtiles"),
            columns=("zoom_level", "tile_column", "tile_row",
                     "tile_data", "tile_alpha"))
        out[mode] = sorted((int(r[0]), int(r[1]), int(r[2]),
                            bytes(r[3]), bytes(r[4])) for r in rows)
        meta = read_mbtiles_metadata(str(tmp_path / f"{mode}.mbtiles"))
        out[mode + "_meta"] = meta
    assert out["overlap"] == out["defer"]
    assert out["overlap_meta"] == out["defer_meta"]

"""Frozen golden fingerprints (FIXTURES.md F5): the md5 of every encoded
tile of a small fixed pyramid build, captured once and committed. Any
change to warp/compose/encode kernels that alters output BYTES trips
this test — decoded-pixel tests would miss encoder regressions, and
future rounds need to know when they break byte-stability of outputs.

Regenerate intentionally with:
    FTR_REGEN_GOLDEN=1 python -m pytest tests/test_golden_frozen.py
"""

import hashlib
import json
import os

import pyarrow.parquet as pq
import pytest

from freemap_tiler_ray.config import TilerConfig
from freemap_tiler_ray.pipelines.tiler import build_pyramid, parquet_files
from freemap_tiler_ray.raster import make_scene

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "pyramid_512_z5_png.json")


def _build_fingerprints(tmp_path):
    spec = make_scene(str(tmp_path / "scene"), anchor=(4, 9, 5), size=512,
                      bands=4, crs="EPSG:3857", disk_frac=0.3)
    cfg = TilerConfig(scene_spec_path=spec.path, out_dir=str(tmp_path / "o"),
                      max_zoom=5, warp_zoom_offset=2, fmt="png")
    res = build_pyramid(cfg)
    t = pq.read_table(parquet_files(res["tile_dirs"]),
                      columns=["zoom", "x", "y", "tile_data", "status"])
    fps = {}
    for i in range(t.num_rows):
        key = f"{t['zoom'][i]}/{t['x'][i]}/{t['y'][i]}"
        data = t["tile_data"][i].as_py()
        fps[key] = (t["status"][i].as_py(),
                    hashlib.md5(data).hexdigest() if data else "")
    return {"tiles": dict(sorted(fps.items())),
            "limits": res["limits_json"]}


def test_frozen_pyramid_fingerprints(ray_session, tmp_path):
    got = _build_fingerprints(tmp_path)
    if os.environ.get("FTR_REGEN_GOLDEN") == "1" or not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
        pytest.skip("golden regenerated — commit tests/golden/")
    with open(GOLDEN) as f:
        exp = json.load(f)
    exp["tiles"] = {k: tuple(v) for k, v in exp["tiles"].items()}
    assert got["limits"] == exp["limits"]
    assert got["tiles"] == exp["tiles"]

"""Resume conformance (SURVEY.md §5 item 4): kill after a partial leaf
stage, restart with resume=True, assert the rerun processes ONLY the
missing megatile partitions and the final output is identical to an
uninterrupted run."""

import json
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from freemap_tiler_ray import tilemath as tm
from freemap_tiler_ray.config import TilerConfig
from freemap_tiler_ray.pipelines import checkpoint as ckpt
from freemap_tiler_ray.pipelines.tiler import build_pyramid, parquet_files
from freemap_tiler_ray.raster import make_scene

MAX_ZOOM = 6


def _read_all_enc(out_dir):
    dirs = [os.path.join(out_dir, n) for n in sorted(os.listdir(out_dir))
            if n.startswith(("level_z", "span_z"))]
    tbl = pq.read_table(parquet_files(dirs),
                        columns=["zoom", "x", "y", "tms_y", "tile_data",
                                 "tile_alpha", "status"]).to_pandas()
    tbl = tbl.sort_values(["zoom", "x", "y"]).reset_index(drop=True)
    return tbl


def test_partial_resume(ray_session, tmp_path):
    spec = make_scene(str(tmp_path / "scene"), anchor=(4, 9, 5), size=1024,
                      bands=4, crs="EPSG:3857", disk_frac=0.25)

    # uninterrupted reference run
    cfg_ref = TilerConfig(scene_spec_path=spec.path,
                          out_dir=str(tmp_path / "ref"),
                          max_zoom=MAX_ZOOM, warp_zoom_offset=1)
    build_pyramid(cfg_ref)
    ref = _read_all_enc(cfg_ref.out_dir)

    # full run, then doctor it back to a "crashed after 2 of 4 megatiles"
    out2 = str(tmp_path / "crash")
    cfg2 = TilerConfig(scene_spec_path=spec.path, out_dir=out2,
                       max_zoom=MAX_ZOOM, warp_zoom_offset=1)
    build_pyramid(cfg2)

    man = ckpt.load_manifest(out2, "leaves")
    all_keys = ckpt.keys_from_ranges(man["attempts"][0]["key_ranges"])
    assert len(all_keys) == 4
    done_keys = sorted(int(k) for k in all_keys)[:2]
    # keep only leaves belonging to the two "done" megatiles
    adir = man["attempts"][0]["dir"]
    kept = []
    mzoom = MAX_ZOOM - 1  # warp_zoom_offset=1
    for f in parquet_files(adir):
        t = pq.read_table(f)
        sh = (t["zoom"].to_numpy() - mzoom).astype(np.int64)
        mkey = tm.tile_key(np.full(t.num_rows, mzoom),
                           t["x"].to_numpy() >> sh, t["y"].to_numpy() >> sh)
        keep = np.isin(mkey, np.asarray(done_keys, np.uint64))
        kept.append(t.filter(keep))
    shutil.rmtree(adir)
    os.makedirs(adir)
    import pyarrow as pa
    pq.write_table(pa.concat_tables(kept), os.path.join(adir, "part-0.parquet"))
    # manifest: only 2 megatiles claimed; downstream stages wiped
    man["attempts"][0]["key_ranges"] = ckpt.ranges_from_keys(done_keys)
    man["attempts"][0]["partitions"] = ckpt.partition_files(adir)
    man["done"] = False
    ckpt.save_manifest(out2, "leaves", man)
    for name in os.listdir(out2):
        if name.startswith("span_z"):
            shutil.rmtree(os.path.join(out2, name), ignore_errors=True)
    for name in os.listdir(os.path.join(out2, "_manifest")):
        if name.startswith("span_z"):
            os.remove(os.path.join(out2, "_manifest", name))

    # resume
    import dataclasses
    build_pyramid(dataclasses.replace(cfg2, resume=True))

    # the rerun's second attempt covers exactly the 2 missing megatiles
    man2 = ckpt.load_manifest(out2, "leaves")
    assert len(man2["attempts"]) == 2
    new_keys = sorted(
        int(k) for k in
        ckpt.keys_from_ranges(man2["attempts"][1]["key_ranges"]))
    assert new_keys == sorted(set(int(k) for k in all_keys)
                              - set(done_keys))
    t2 = pq.read_table(parquet_files(man2["attempts"][1]["dir"]))
    sh2 = (t2["zoom"].to_numpy() - mzoom).astype(np.int64)
    mkey2 = np.unique(tm.tile_key(np.full(t2.num_rows, mzoom),
                                  t2["x"].to_numpy() >> sh2,
                                  t2["y"].to_numpy() >> sh2))
    assert set(int(k) for k in mkey2) == set(int(k) for k in new_keys)

    got = _read_all_enc(out2)
    # byte-identical final tables (incl. encoded blobs)
    assert got.equals(ref)

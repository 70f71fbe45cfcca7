"""Window-table raster source (SURVEY.md §2.1 S1, FIXTURES.md F2).

A raster scene as a TABLE of fixed-size windows
  (scene_id, window_row, window_col, pixels: binary)
— the pure-Ray ingest shape: at 100 TB the source raster lives in object
storage as such a table (or COG tiles) and warp actors fetch only the
windows their megatile footprint needs. Here we provide both directions
plus a Ray generation pipeline over the mmap'd scene.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..raster import SceneSpec, open_scene


def scene_windows_dataset(spec: SceneSpec, window: int = 256):
    """Scene -> Dataset of window rows, generated distributedly (each
    task slices its own windows out of the mmap — no driver pixel I/O)."""
    import ray.data as rd

    nwy = (spec.height + window - 1) // window
    nwx = (spec.width + window - 1) // window
    path = spec.path

    def gen(batch: pa.Table) -> pa.Table:
        img = open_scene(SceneSpec.load(path))
        idx = batch["id"].to_numpy()
        rows, cols, bufs = [], [], []
        for i in idx:
            wr, wc = int(i) // nwx, int(i) % nwx
            win = np.asarray(img[wr * window:(wr + 1) * window,
                                 wc * window:(wc + 1) * window])
            rows.append(wr)
            cols.append(wc)
            bufs.append(np.ascontiguousarray(win).tobytes())
        return pa.table({
            "scene_id": pa.array([spec.scene_id] * len(rows), pa.string()),
            "window_row": pa.array(rows, pa.int32()),
            "window_col": pa.array(cols, pa.int32()),
            "pixels": pa.array(bufs, pa.binary()),
        })

    return rd.range(nwy * nwx).map_batches(gen, batch_format="pyarrow"), (nwy, nwx)


def write_window_table(spec: SceneSpec, out_dir: str, window: int = 256):
    ds, shape = scene_windows_dataset(spec, window)
    ds.write_parquet(out_dir)
    return shape


def window_table_to_scene(parquet_dir: str, ref_spec: SceneSpec,
                          out_path: str, window: int = 256) -> SceneSpec:
    """Reassemble a window table into a scene file (driver-side; used to
    feed the warp actors, which need random window access. At scale the
    warp actor would instead fetch windows directly from the table by
    (row, col) key — same georeference math)."""
    import pyarrow.parquet as pq

    from ..pipelines.tiler import parquet_files

    tbl = pq.read_table(parquet_files(parquet_dir))
    bands = ref_spec.bands
    img = np.zeros((ref_spec.height, ref_spec.width, bands), np.uint8)
    wr = tbl["window_row"].to_numpy()
    wc = tbl["window_col"].to_numpy()
    for i in range(tbl.num_rows):
        buf = np.frombuffer(tbl["pixels"][i].as_py(), np.uint8)
        r0, c0 = int(wr[i]) * window, int(wc[i]) * window
        h = min(window, ref_spec.height - r0)
        w = min(window, ref_spec.width - c0)
        img[r0:r0 + h, c0:c0 + w] = buf.reshape(h, w, bands)
    if not out_path.endswith(".npy"):
        out_path += ".npy"
    with open(out_path, "wb") as f:
        np.save(f, img)
    import dataclasses
    spec = dataclasses.replace(ref_spec, path=out_path,
                               scene_id=os.path.basename(out_path)[:-4])
    spec.save()
    return spec

"""Pyramid compose: 4 children -> 1 parent (grouped aggregation).

The Ray-Data-native replacement for the reference's compose-cache +
scheduler machinery (/root/reference/src/processor.rs:227-321,
state.rs): instead of a shared mutable HashMap of child buffers, each
zoom level is one `groupby(parent_key).map_groups(compose)` shuffle —
Ray's object store holds child buffers between levels (SURVEY.md §2.3
ST2/ST3).

Semantics mirrored exactly:
  - children are placed at quadrant offsets so_x=(x&1)*ts,
    so_y=(y&1... reference: (i&1)*ts, (i>>1)*ts with children order
    NW,NE,SW,SE) — i.e. quadrant = (x & 1, y & 1) in y-down XYZ coords
    (processor.rs:261-262);
  - missing / empty children leave their quadrant zeroed
    (processor.rs:254-257);
  - a parent with zero data children emits an empty marker
    (processor.rs:319-321, 594-601);
  - the 2ts x 2ts mosaic is Lanczos3-downsampled to ts x ts
    (processor.rs:278-309).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import tilemath as tm
from ..resample import downsample2x


def add_parent_key(batch: pa.Table) -> pa.Table:
    """Append pkey = packed (zoom-1, x>>1, y>>1) — the shuffle key."""
    z = batch["zoom"].to_numpy()
    x = batch["x"].to_numpy()
    y = batch["y"].to_numpy()
    pkey = tm.tile_key(z - 1, x >> 1, y >> 1).astype(np.uint64)
    return batch.append_column("pkey", pa.array(pkey, pa.uint64()))


def make_compose_fn(tile_size: int, bands: int, kernel: str = "lanczos3"):
    ts, b = tile_size, bands

    def compose(group: pd.DataFrame) -> pd.DataFrame:
        pz, px, py = tm.tile_key_decode(np.uint64(group["pkey"].iloc[0]))
        pz, px, py = int(pz), int(px), int(py)
        data = group[group["status"] == "data"]
        if len(data) == 0:
            return pd.DataFrame({"zoom": [pz], "x": [px], "y": [py],
                                 "pixels": [b""], "status": ["empty"]})
        mosaic = np.zeros((2 * ts, 2 * ts, b), np.uint8)
        for _, row in data.iterrows():
            so_x = (int(row["x"]) & 1) * ts
            so_y = (int(row["y"]) & 1) * ts
            child = np.frombuffer(row["pixels"], np.uint8).reshape(ts, ts, b)
            mosaic[so_y:so_y + ts, so_x:so_x + ts] = child
        parent = downsample2x(mosaic, kernel=kernel)
        return pd.DataFrame({"zoom": [pz], "x": [px], "y": [py],
                             "pixels": [np.ascontiguousarray(parent).tobytes()],
                             "status": ["data"]})

    return compose


def compose_level(ds, tile_size: int, bands: int, kernel: str = "lanczos3",
                  num_blocks: int | None = None):
    """Raw-buffer rows at zoom z -> raw-buffer rows at z-1.

    Group sizes are <= 4 rows by construction, so no salting is needed;
    the low-zoom small-N regime (few groups) is handled by the caller
    shrinking num_blocks as the pyramid narrows (the analog of the
    reference's tiny top-of-pyramid singleton tasks, state.rs:56-61).
    """
    keyed = ds.map_batches(add_parent_key, batch_format="pyarrow")
    grouped = keyed.groupby("pkey")
    out = grouped.map_groups(make_compose_fn(tile_size, bands, kernel),
                             batch_format="pandas")
    return out.select_columns(["zoom", "x", "y", "pixels", "status"])

"""Encode / decode stages (stateless map_batches).

Encode mirrors /root/reference/src/processor.rs:493-562: data rows get
(tile_data, tile_alpha) via codecs.encode_tile (opaque detection +
alpha-split for JPEG, processor.rs:505-517); empty-marker rows keep
empty blobs (K4). Adds the TMS-flipped row (tile_inserter.rs:54).

Decode is the resume path (processor.rs:194-221): stored tiles back to
raw interleaved buffers so they can seed the pyramid compose.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import tilemath as tm
from ..codecs import decode_tile, encode_tile


class EncodeStage:
    """keep_pixels=True appends the encoded columns NEXT TO the raw
    buffer, so one write per pyramid level serves both consumers: the
    sink reads (tile_data, tile_alpha), the next compose level reads
    (pixels) — column-pruned reads of the same parquet files, one
    execution per level instead of two."""

    def __init__(self, fmt: str = "png", quality: int = 85,
                 tile_size: int = 256, bands: int = 4,
                 keep_pixels: bool = False, limits_actor=None,
                 pixels_only_zoom: int | None = None):
        self.fmt = fmt
        self.quality = quality
        self.ts = tile_size
        self.bands = bands
        self.keep_pixels = keep_pixels
        # state/limits.LimitsActor handle(s); a list is treated as shards
        # and each worker picks one by pid so updates fan out
        if limits_actor is not None and not isinstance(limits_actor, list):
            limits_actor = [limits_actor]
        self.limits_actor = limits_actor
        # raw pixels are only ever re-read at the NEXT span's input zoom;
        # storing them for other rows multiplies write volume ~12x (raw
        # 256KB vs ~20KB encoded) for data nobody reads
        self.pixels_only_zoom = pixels_only_zoom

    def __call__(self, batch: pa.Table) -> pa.Table:
        ts, b = self.ts, self.bands
        zoom = batch["zoom"].to_numpy()
        y = batch["y"].to_numpy()
        data, alpha = [], []
        status = batch["status"].to_pylist()
        pix = batch["pixels"]
        for i, st in enumerate(status):
            if st != "data":
                data.append(b"")
                alpha.append(b"")
                continue
            buf = np.frombuffer(pix[i].as_py(), np.uint8).reshape(ts, ts, b)
            d, a = encode_tile(buf, self.fmt, self.quality)
            data.append(d)
            alpha.append(a)
        tms = tm.reversed_y(zoom, y)
        if self.limits_actor is not None:
            import numpy as _np

            from ..state.limits import partial_limits
            is_data = _np.array([s == "data" for s in status])
            if is_data.any():
                import os as _os

                import ray as _ray

                # acknowledged update: the stage execution finishing then
                # guarantees every partial reached the actor (a
                # fire-and-forget update could still be in flight when
                # the driver collects); pid-sharded so no single actor
                # serializes every encode task
                shard = self.limits_actor[_os.getpid()
                                          % len(self.limits_actor)]
                _ray.get(shard.update.remote(
                    partial_limits(zoom, batch["x"].to_numpy(), tms, is_data)))
        cols = {
            "zoom": batch["zoom"], "x": batch["x"], "y": batch["y"],
            "tms_y": pa.array(tms, pa.int64()),
            "tile_data": pa.array(data, pa.binary()),
            "tile_alpha": pa.array(alpha, pa.binary()),
            "status": batch["status"],
        }
        if self.keep_pixels:
            if self.pixels_only_zoom is not None:
                keep = zoom == self.pixels_only_zoom
                pix_col = batch["pixels"].combine_chunks() \
                    if isinstance(batch["pixels"], pa.ChunkedArray) \
                    else batch["pixels"]
                cols["pixels"] = pa.array(
                    [pix_col[i].as_py() if keep[i] else b""
                     for i in range(len(keep))], pa.binary())
            else:
                cols["pixels"] = batch["pixels"]
        return pa.table(cols)


class DecodeStage:
    """Encoded rows -> raw buffer rows (resume seeding, processor.rs:194-221)."""

    def __init__(self, fmt: str = "png", tile_size: int = 256, bands: int = 4):
        self.fmt = fmt
        self.ts = tile_size
        self.bands = bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        status = batch["status"].to_pylist()
        pixels = []
        for i, st in enumerate(status):
            if st != "data":
                pixels.append(b"")
                continue
            buf = decode_tile(batch["tile_data"][i].as_py(),
                              batch["tile_alpha"][i].as_py(), self.fmt, self.ts)
            pixels.append(np.ascontiguousarray(buf).tobytes())
        return pa.table({
            "zoom": batch["zoom"], "x": batch["x"], "y": batch["y"],
            "pixels": pa.array(pixels, pa.binary()),
            "status": batch["status"],
        })

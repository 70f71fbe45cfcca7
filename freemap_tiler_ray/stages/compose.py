"""Pyramid compose: 4 children -> 1 parent (grouped aggregation).

The Ray-Data-native replacement for the reference's compose-cache +
scheduler machinery (/root/reference/src/processor.rs:227-321,
state.rs): instead of a shared mutable HashMap of child buffers, each
zoom level is one grouped shuffle — Ray's object store holds child
buffers between levels (SURVEY.md §2.3 ST2/ST3).

Semantics mirrored exactly:
  - children are placed at quadrant offsets (x & 1, y & 1) * ts in
    y-down XYZ coords (processor.rs:261-262);
  - missing / empty children leave their quadrant zeroed
    (processor.rs:254-257);
  - a parent with zero data children emits an empty marker
    (processor.rs:319-321, 594-601);
  - the 2ts x 2ts mosaic is Lanczos3-downsampled to ts x ts
    (processor.rs:278-309).

Physical plan: the shuffle key is the COARSE parent key (pkey with the
low 2*COARSE_BITS morton bits dropped), so one group = up to
4^COARSE_BITS sibling parents. All parents in a group are composed in
one vectorized pass (stacked mosaics + batched Lanczos) — per-group
Python overhead and the per-level shuffle partition count both drop by
~64x versus one-group-per-parent, which is what keeps the tiny
top-of-pyramid levels from being shuffle-overhead-bound (the analog of
the reference's singleton top-of-pyramid tasks, state.rs:56-61).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import tilemath as tm
from ..resample import downsample2x_batch

COARSE_BITS = 3          # 64 parents (256 children) per shuffle group
_BATCH_MOSAICS = 4       # downsample chunk: keeps the float working set
                         # ~16 MB so concurrent groups stay cache-resident
                         # (DRAM bandwidth is the scaling ceiling here)


def make_add_shuffle_key(levels: int = 1, coarse: int = COARSE_BITS):
    """skey = ancestor key `levels + coarse` levels up: every child of
    every parent produced by a `levels`-deep compose lands in the same
    group, with 4^coarse sibling subtrees batched per group. The caller
    keeps levels + coarse bounded so a group stays ~64 MB."""

    def add_key(batch: pa.Table) -> pa.Table:
        z = batch["zoom"].to_numpy()
        x = batch["x"].to_numpy()
        y = batch["y"].to_numpy()
        n = levels + coarse
        zk = np.maximum(z - n, 0)
        skey = tm.tile_key(zk, x >> n, y >> n).astype(np.uint64)
        return batch.append_column("skey", pa.array(skey, pa.uint64()))

    return add_key


def _compose_once(zoom: int, xs, ys, is_data, pix_list, ts, b, kernel):
    """One level of parent composition over vectors of children.
    Returns (px, py, p_is_data, p_pix_list) at zoom-1."""
    pkeys = tm.tile_key(np.full(len(xs), zoom) - 1, xs >> 1, ys >> 1)
    uniq, inv = np.unique(pkeys, return_inverse=True)
    _, px, py = tm.tile_key_decode(uniq)
    has_data = np.zeros(len(uniq), bool)
    np.logical_or.at(has_data, inv, is_data)

    didx = np.flatnonzero(has_data)
    pos_of = {int(u): i for i, u in enumerate(didx)}
    G = len(didx)
    out_pix: list[bytes] = [b""] * len(uniq)
    if G:
        mosaics = np.zeros((G, 2 * ts, 2 * ts, b), np.uint8)
        for i in np.flatnonzero(is_data):
            gi = pos_of.get(int(inv[i]))
            if gi is None:
                continue
            sx = (int(xs[i]) & 1) * ts
            sy = (int(ys[i]) & 1) * ts
            child = np.frombuffer(pix_list[i], np.uint8).reshape(ts, ts, b)
            mosaics[gi, sy:sy + ts, sx:sx + ts] = child
        for c0 in range(0, G, _BATCH_MOSAICS):
            chunk = downsample2x_batch(mosaics[c0:c0 + _BATCH_MOSAICS],
                                       kernel=kernel)
            for j in range(chunk.shape[0]):
                out_pix[didx[c0 + j]] = np.ascontiguousarray(
                    chunk[j]).tobytes()
    return (np.asarray(px, np.int64), np.asarray(py, np.int64),
            has_data, out_pix)


def make_compose_fn(tile_size: int, bands: int, kernel: str = "lanczos3",
                    levels: int = 1):
    """Group fn composing `levels` pyramid levels inside ONE shuffle
    group (the group key must be the ancestor key `levels + COARSE_BITS`
    up). Emits rows for every produced level z-1 .. z-levels."""
    ts, b = tile_size, bands

    def compose_group(group: pa.Table) -> pa.Table:
        zoom = int(group["zoom"][0].as_py())
        xs = group["x"].to_numpy().astype(np.int64)
        ys = group["y"].to_numpy().astype(np.int64)
        is_data = np.asarray(group["status"].to_pandas()) == "data"
        pix = group["pixels"].combine_chunks().to_pylist()
        out = {"zoom": [], "x": [], "y": [], "pixels": [], "status": []}
        for step in range(levels):
            px, py, has_data, ppix = _compose_once(
                zoom - step, xs, ys, is_data, pix, ts, b, kernel)
            out["zoom"].extend([zoom - step - 1] * len(px))
            out["x"].extend(px.tolist())
            out["y"].extend(py.tolist())
            out["pixels"].extend(ppix)
            out["status"].extend("data" if d else "empty" for d in has_data)
            xs, ys, is_data, pix = px, py, has_data, ppix
        return pa.table({
            "zoom": pa.array(out["zoom"], pa.int64()),
            "x": pa.array(out["x"], pa.int64()),
            "y": pa.array(out["y"], pa.int64()),
            "pixels": pa.array(out["pixels"], pa.binary()),
            "status": pa.array(out["status"], pa.string()),
        })

    return compose_group


def choose_span(t: int, z: int, cpus: int, max_span: int = 3):
    """Pick (levels, coarse) for a span step: deepen the span (fewer
    shuffles) and coarsen the groups (less per-group overhead) only while
    the group count stays >= 2*cpus — otherwise the heavy bottom span
    runs on a handful of groups and the CPUs idle. Tiny levels (t <=
    4^4) take the deepest span regardless (data is trivial there).
    Group size stays <= 4^4 children (~64 MB at 256^2 RGBA)."""
    target = 2 * cpus
    if t <= 4 ** 4:
        # tiny top-of-pyramid: compose ALL remaining levels in one
        # execution (one group holds the entire remaining subtree —
        # the analog of the reference's singleton top-of-pyramid tasks)
        return z, 0
    max_l = min(max_span, z)
    lev = 1
    while lev < max_l and t / 4 ** (lev + 1) >= target:
        lev += 1
    coarse = 0
    while lev + coarse < 4 and t / 4 ** (lev + coarse + 1) >= target:
        coarse += 1
    return lev, coarse


def make_local_compose(levels: int, tile_size: int, bands: int,
                       kernel: str = "lanczos3"):
    """Shuffle-free compose for megatile-aligned blocks: a warp megatile
    covers a complete z..z-offset subtree (the ancestor cell), so every
    parent's children are already in the SAME block — the reference's
    compose-cache locality argument (README.md:3-4, main.rs:204) turned
    into a map_batches stage. Emits the input rows plus all composed
    ancestor rows down `levels` levels. Use with batch_size=None so
    blocks (one per megatile) are never re-bundled."""
    ts, b = tile_size, bands

    def f(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        zoom = int(batch["zoom"][0].as_py())
        xs = batch["x"].to_numpy().astype(np.int64)
        ys = batch["y"].to_numpy().astype(np.int64)
        is_data = np.asarray(batch["status"].to_pandas()) == "data"
        pix = batch["pixels"].combine_chunks().to_pylist()
        tables = [batch]
        for step in range(levels):
            px, py, has_data, ppix = _compose_once(
                zoom - step, xs, ys, is_data, pix, ts, b, kernel)
            tables.append(pa.table({
                "zoom": pa.array(np.full(len(px), zoom - step - 1), pa.int32()),
                "x": pa.array(px, pa.int64()),
                "y": pa.array(py, pa.int64()),
                "pixels": pa.array(ppix, pa.binary()),
                "status": pa.array(["data" if d else "empty"
                                    for d in has_data], pa.string()),
            }))
            xs, ys, is_data, pix = px, py, has_data, ppix
        tables[0] = pa.table({
            "zoom": batch["zoom"].cast(pa.int32()), "x": batch["x"],
            "y": batch["y"], "pixels": batch["pixels"],
            "status": batch["status"]})
        return pa.concat_tables(tables)

    return f


def compose_level(ds, tile_size: int, bands: int, kernel: str = "lanczos3",
                  num_blocks: int | None = None, levels: int = 1,
                  coarse: int | None = None):
    """Raw-buffer rows at zoom z -> raw-buffer rows at z-1 .. z-levels
    (one shuffle for the whole span). num_blocks caps the shuffle width
    for small levels (caller estimates from the tile-range geometry).

    The caller guarantees z >= levels; groups are capped at
    4^(levels + coarse) children (constant ~64 MB group budget)."""
    if coarse is None:
        coarse = max(0, 4 - levels)
    keyed = ds.map_batches(make_add_shuffle_key(levels, coarse),
                           batch_format="pyarrow")
    if num_blocks is not None:
        keyed = keyed.repartition(num_blocks)
    grouped = keyed.groupby("skey")
    out = grouped.map_groups(
        make_compose_fn(tile_size, bands, kernel, levels=levels),
        batch_format="pyarrow")
    return out.select_columns(["zoom", "x", "y", "pixels", "status"])

"""End-to-end tile-pyramid pipeline (the flagship).

Ray-Data-native reimplementation of the reference's three flows
(/root/reference/src/main.rs:43-365, SURVEY.md §3):

  universe (range -> megatile keys, polygon-filtered, never on the driver)
    -> ONE fused task per megatile: warp (T6/T7, worker-cached source
       handle) -> sector extraction + empty markers (T8/T9/K4) ->
       shuffle-free subtree compose down to z-offset (the megatile block
       IS the subtree — the reference's compose-cache locality,
       README.md:3-4) -> encode (T11-T13, streamed limits partials)
    -> leaf parquet  [resumable partitions = attempts, bulk anti-join]
    -> bottom-up compose SPANS: one groupby(ancestor_key) shuffle covers
       several pyramid levels; the tiny top-of-pyramid finishes in a
       single execution (the analog of the reference's singleton tasks)
    -> limits merged from per-stage streamed partials (A1, ST5 analog)
    -> MBTiles compaction (single writer, K1-K3)

The children-before-parent dependency is not expressible inside one Ray
Data DAG stage, so each span is one checkpointed shuffle — the idiomatic
replacement for the reference's z-order LIFO scheduler (SURVEY.md §7.3).
Every stage's parquet holds both raw pixels (only at the next span's
input zoom) and encoded blobs; consumers column-prune, and a rerun skips
any stage whose manifest says done.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from .. import tilemath as tm
from ..config import TilerConfig
from ..raster import load_raster_spec
from ..sources.geojson_src import read_bounding_polygon
from ..stages.compose import compose_level
from ..stages.encode import EncodeStage
from ..stages.geom import rects_intersect_polygon
from ..stages.sectors import SectorStage
from ..stages.warp import WarpStage
from ..state.limits import limits_json
from . import checkpoint as ckpt

def parquet_files(dirs) -> list[str]:
    """Expand directories to their parquet part files (ray.data
    read_parquet accepts a list of files, not of directories)."""
    if isinstance(dirs, str):
        dirs = [dirs]
    out = []
    for d in dirs:
        for root, _, files in os.walk(d):
            out.extend(os.path.join(root, f) for f in sorted(files)
                       if f.endswith(".parquet"))
    return out


def _resolve_polygon(cfg: TilerConfig):
    bp = cfg.bounding_polygon
    if bp is None:
        return None
    if isinstance(bp, str):
        return read_bounding_polygon(bp)
    return np.asarray(bp, np.float64)


def megatile_universe(spec, cfg: TilerConfig, ring=None,
                      interleave: bool = False):
    """Lazy tile-universe generation (T3): the megatile index rectangle is
    derived from the reprojected source bbox (driver-side scalar math),
    then materialized distributedly from ray.data.range — the driver
    never holds the tile list.

    interleave=True applies a bit-reversal permutation to the index
    before decoding, so execution order mixes far-apart megatiles: real
    scenes concentrate heavy (data-dense) megatiles spatially, and
    row-major order would put whole waves of heavy tasks back-to-back —
    interleaving evens the per-wave load and shrinks the straggler tail
    at high parallelism. Resume key RANGES must stay compact, so callers
    compute ranges from the UNPERMUTED variant (same key set)."""
    offset = cfg.effective_offset
    mzoom = cfg.max_zoom - offset
    bbox = spec.mercator_bbox()
    leaf_range = tm.bbox_covered_tile_range(*bbox, cfg.max_zoom)
    mx0, my0, mx1, my1 = tm.bbox_covered_tile_range(*bbox, mzoom)
    w = mx1 - mx0 + 1
    n = w * (my1 - my0 + 1)
    kbits = max(1, int(np.ceil(np.log2(max(n, 2)))))

    def gen(batch: pa.Table) -> pa.Table:
        idx = batch["id"].to_numpy()
        if interleave:
            v = idx.astype(np.uint64)
            r = np.zeros_like(v)
            for b in range(kbits):
                r |= ((v >> np.uint64(b)) & np.uint64(1)) \
                    << np.uint64(kbits - 1 - b)
            idx = r[r < n].astype(np.int64)
        mx = mx0 + (idx % w)
        my = my0 + (idx // w)
        if ring is not None:
            bx0, by0, bx1, by1 = tm.bounds(mzoom, mx, my)
            keep = rects_intersect_polygon(bx0, by0, bx1, by1, ring)
            mx, my = mx[keep], my[keep]
        return pa.table({"mz": pa.array(np.full(len(mx), mzoom), pa.int32()),
                         "mx": pa.array(mx, pa.int64()),
                         "my": pa.array(my, pa.int64())})

    span = (1 << kbits) if interleave else n
    blocks = max(1, min(n, 4 * _cpus()))
    ds = rd.range(span, override_num_blocks=blocks).map_batches(
        gen, batch_format="pyarrow")
    return ds, mzoom, leaf_range, bbox, n


def _cpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        return 8


def _anti_join_done(ds, done_ranges):
    """Bulk resume anti-join: drop megatiles already completed by a prior
    attempt. The done-set is a list of contiguous [lo, hi] key runs —
    O(runs) bytes broadcast once via ray.put (never re-shipped per
    batch) and tested by searchsorted, so neither the driver nor the
    manifest ever holds O(#megatiles) keys."""
    if not done_ranges:
        return ds
    lo = np.array([r[0] for r in done_ranges], np.uint64)
    hi = np.array([r[1] for r in done_ranges], np.uint64)
    ref = ray.put((lo, hi))

    def flt(batch: pa.Table) -> pa.Table:
        lo_, hi_ = ray.get(ref)
        keys = tm.tile_key(batch["mz"].to_numpy(), batch["mx"].to_numpy(),
                           batch["my"].to_numpy()).astype(np.uint64)
        idx = np.searchsorted(lo_, keys, side="right").astype(np.int64) - 1
        inside = (idx >= 0) & (keys <= hi_[np.maximum(idx, 0)])
        return batch.filter(pa.array(~inside))

    return ds.map_batches(flt, batch_format="pyarrow")


def _todo_ranges(ds) -> list[list[int]]:
    """Contiguous key runs of a megatile dataset, computed per block
    (vectorized diff) and union-merged on the driver — the driver holds
    O(runs), not O(#megatiles)."""
    def runs(batch: pa.Table) -> pa.Table:
        k = np.sort(tm.tile_key(batch["mz"].to_numpy(),
                                batch["mx"].to_numpy(),
                                batch["my"].to_numpy()).astype(np.uint64))
        if len(k) == 0:
            return pa.table({"lo": pa.array([], pa.uint64()),
                             "hi": pa.array([], pa.uint64())})
        brk = np.where(np.diff(k) != 1)[0]
        return pa.table({
            "lo": pa.array(k[np.concatenate(([0], brk + 1))], pa.uint64()),
            "hi": pa.array(k[np.concatenate((brk, [len(k) - 1]))],
                           pa.uint64())})

    df = ds.map_batches(runs, batch_format="pyarrow").to_pandas()
    if len(df) == 0:                     # fully-resumed: no todo blocks
        return []
    return ckpt.merge_ranges([[[int(a), int(b)]
                               for a, b in zip(df["lo"], df["hi"])]])


@ray.remote
def _compose_top_task(files: list[str], zoom: int, ts: int, bands: int,
                      kernel: str, fmt: str, quality: int,
                      sdir: str) -> dict:
    """Singleton top-of-pyramid task: once the remaining pyramid fits a
    constant budget (<= 4^4 tiles at the current zoom — O(1) data at ANY
    input scale), one Ray task reads the boundary-zoom rows, composes
    every remaining level, encodes, and writes one parquet file. This
    replaces several near-empty groupby barriers whose fixed all-to-all
    cost (~seconds each) does not shrink with cluster size — the direct
    analog of the reference's singleton top-of-pyramid tasks
    (state.rs:56-61). Returns the stage's limits partial."""
    import pyarrow.parquet as pq

    from ..stages.compose import _compose_once
    from ..stages.encode import EncodeStage
    from ..state.limits import partial_limits

    tbl = pq.read_table(files, columns=["zoom", "x", "y", "pixels",
                                        "status"],
                        filters=[("zoom", "=", zoom)])
    xs = tbl["x"].to_numpy().astype(np.int64)
    ys = tbl["y"].to_numpy().astype(np.int64)
    is_data = np.asarray(tbl["status"].to_pandas()) == "data"
    pix = tbl["pixels"].combine_chunks().to_pylist()
    rows = {"zoom": [], "x": [], "y": [], "pixels": [], "status": []}
    for step in range(zoom):
        xs, ys, is_data, pix = _compose_once(
            zoom - step, xs, ys, is_data, pix, ts, bands, kernel)
        rows["zoom"].extend([zoom - step - 1] * len(xs))
        rows["x"].extend(xs.tolist())
        rows["y"].extend(ys.tolist())
        rows["pixels"].extend(pix)
        rows["status"].extend("data" if d else "empty" for d in is_data)
    out = pa.table({"zoom": pa.array(rows["zoom"], pa.int64()),
                    "x": pa.array(rows["x"], pa.int64()),
                    "y": pa.array(rows["y"], pa.int64()),
                    "pixels": pa.array(rows["pixels"], pa.binary()),
                    "status": pa.array(rows["status"], pa.string())})
    enc = EncodeStage(fmt, quality, ts, bands, keep_pixels=False)(out)
    os.makedirs(sdir, exist_ok=True)
    pq.write_table(enc, os.path.join(sdir, "part-0.parquet"))
    return partial_limits(enc["zoom"].to_numpy(), enc["x"].to_numpy(),
                          enc["tms_y"].to_numpy(),
                          np.asarray(enc["status"].to_pandas()) == "data")


def build_pyramid(cfg: TilerConfig) -> dict:
    """Run (or resume) the full pyramid build. Returns summary metadata."""
    t_start = time.time()
    spec = load_raster_spec(cfg.scene_spec_path)
    ring = _resolve_polygon(cfg)
    if not cfg.resume and os.path.isdir(cfg.out_dir):
        # fresh run into a used out_dir: clear stale checkpoints so parquet
        # appends can't duplicate rows (the reference likewise refuses an
        # existing target unless continuing, main.rs:58-60)
        import shutil
        for name in os.listdir(cfg.out_dir):
            if name.startswith(("level_z", "span_z", "_manifest")):
                shutil.rmtree(os.path.join(cfg.out_dir, name), ignore_errors=True)
    os.makedirs(cfg.out_dir, exist_ok=True)
    offset = cfg.effective_offset
    bands = spec.band_count
    metrics: dict[str, float] = {}

    universe, mzoom, leaf_range, bbox, n_mega = megatile_universe(spec, cfg, ring)
    # execution-order variant: same key set, straggler-friendly order
    universe_x, *_ = megatile_universe(spec, cfg, ring, interleave=True)

    # ---- MBTiles compaction starts NOW (K1-K3, single writer): level
    # dirs stream into a dedicated writer thread as their manifests
    # land, so the sqlite insert overlaps the composes above instead of
    # serializing after them (a fixed tail that a larger cluster cannot
    # shrink). The existing-target check mirrors main.rs:58-60.
    mbt = None
    if cfg.target_file and not (cfg.resume
                                and ckpt.stage_done(cfg.out_dir, "mbtiles")):
        if os.path.exists(cfg.target_file):
            if not cfg.resume:
                raise FileExistsError(cfg.target_file)
            os.unlink(cfg.target_file)
        from ..sources.mbtiles import ProgressiveMBTilesWriter
        mbt = ProgressiveMBTilesWriter(cfg.target_file, cfg.max_zoom,
                                       cfg.fmt, bbox, cfg.insert_empty)
    # FTR_MBT_DEFER=1: queue level dirs only at finish (writer thread
    # does not run concurrently with composes) — an A/B knob to measure
    # the overlap's scheduler interference on a fully saturated box.
    _mbt_deferred: list[str] = []
    _mbt_defer = os.environ.get("FTR_MBT_DEFER", "") == "1"

    def _mbt_add(d: str) -> None:
        if mbt is not None:
            (_mbt_deferred.append(d) if _mbt_defer else mbt.add_dir(d))
    lvl_dir = lambda z: os.path.join(cfg.out_dir, f"level_z{z}")  # noqa: E731
    from ..state.limits import LimitsActor, merge_limits
    limit_parts: list[dict] = []

    def _make_encoder(pixels_only_zoom: int | None = None):
        """Fresh limits collectors per stage; their merged partial lands
        in the stage manifest so resume recovers limits without
        re-reading tiles (the streaming analog of processor.rs:567-584).
        The collector is SHARDED (one actor per ~4 CPUs): each encode
        task acks a tiny update to its pid-local shard, so no single
        actor serializes every encode task on a wide cluster."""
        shards = [LimitsActor.remote()
                  for _ in range(max(1, min(8, _cpus() // 4)))]
        enc = EncodeStage(cfg.fmt, cfg.jpeg_quality, cfg.tile_size, bands,
                          keep_pixels=True, limits_actor=shards,
                          pixels_only_zoom=pixels_only_zoom)
        return shards, enc

    def _collect(shards) -> dict:
        part = merge_limits(ray.get([a.get.remote() for a in shards]))
        for a in shards:
            ray.kill(a)
        limit_parts.append(part)
        return part

    # ---- leaf stage (warp -> sectors), resumable by megatile partition ----
    stage = "leaves"
    man = ckpt.load_manifest(cfg.out_dir, stage) or {"attempts": [], "done": False}
    # local (in-task) compose depth: 0 when resuming a manifest whose
    # attempts hold only bare leaves (e.g. an MBTiles import)
    local_levels = man.get("leaf_min_zoom",
                           cfg.max_zoom - min(offset, cfg.max_zoom))
    local_levels = cfg.max_zoom - local_levels
    man["leaf_min_zoom"] = cfg.max_zoom - local_levels
    if not (cfg.resume and man["done"]):
        t0 = time.time()
        done_ranges = ckpt.merge_ranges(
            [a.get("key_ranges", []) for a in man["attempts"]])
        todo = _anti_join_done(universe, done_ranges) if cfg.resume \
            else universe
        todo_ranges = _todo_ranges(todo)
        for a in man["attempts"]:         # prior attempts' stored limits
            if a.get("limits_partial"):
                limit_parts.append(a["limits_partial"])
        if ckpt.range_count(todo_ranges) or not man["attempts"]:
            attempt = len(man["attempts"])
            adir = os.path.join(lvl_dir(cfg.max_zoom), f"attempt-{attempt}")
            if os.path.isdir(adir):
                # leftovers of a crashed, never-recorded attempt: a rerun
                # into the same dir would append duplicate part files
                import shutil
                shutil.rmtree(adir)
            todo = _anti_join_done(universe_x, done_ranges) if cfg.resume \
                else universe_x
            # ONE fused task per megatile: warp -> sector extraction ->
            # shuffle-free subtree compose (a megatile block holds the
            # complete z..z-offset subtree — the reference's compose-cache
            # locality, README.md:3-4) -> encode. Fusion keeps the 16 MB
            # megatile buffer and the raw subtree in task-local memory
            # instead of bouncing them through the object store (which
            # costs ~32 MB of store traffic per megatile and saturates
            # single-node memory bandwidth). Warp state (the scene
            # handle) is a once-per-worker cache (stages/warp).
            from ..stages.compose import make_local_compose
            warp = WarpStage(scene_spec_path=cfg.scene_spec_path,
                             tile_size=cfg.tile_size,
                             warp_zoom_offset=offset, kernel=cfg.kernel)
            sector = SectorStage(cfg.tile_size, offset, bands, leaf_range,
                                 ring)
            local = (make_local_compose(local_levels, cfg.tile_size, bands,
                                        cfg.kernel)
                     if local_levels > 0 else (lambda t: t))
            actor, enc = _make_encoder(
                pixels_only_zoom=cfg.max_zoom - local_levels)

            def leaf_task(batch, _w=warp, _s=sector, _l=local, _e=enc):
                return _e(_l(_s(_w(batch))))

            leaves = todo.map_batches(leaf_task, batch_format="pyarrow",
                                      batch_size=1)
            leaves.write_parquet(adir)
            man["attempts"].append({
                "dir": adir,
                "key_ranges": todo_ranges,
                "partitions": ckpt.partition_files(adir),
                "limits_partial": _collect(actor),
            })
        man["done"] = True
        man["lineage"] = {"inputs": [cfg.scene_spec_path], "stage": "warp+sector"}
        metrics["warp"] = man["metrics_sec"] = time.time() - t0
        ckpt.save_manifest(cfg.out_dir, stage, man)
    else:
        metrics["warp"] = 0.0
        for a in man["attempts"]:
            if a.get("limits_partial"):
                limit_parts.append(a["limits_partial"])

    # ---- bottom-up compose in SPANS of several levels per shuffle ----
    # (each span's parquet holds raw pixels AND encoded blobs for every
    # level it produced; consumers column-prune / zoom-filter, so one
    # execution covers `span` pyramid levels)
    from ..stages.compose import choose_span
    out_dirs = [lvl_dir(cfg.max_zoom)]
    _mbt_add(out_dirs[0])  # leaf level = ~3/4 of all tiles: its insert
    #                        hides behind the composes below
    z = man["leaf_min_zoom"]      # shuffled spans start below the local compose
    src = os.path.join(lvl_dir(cfg.max_zoom), "")
    import pyarrow.compute as _pc
    src_filter = _pc.field("zoom") == z
    while z > 0:
        lx0, ly0, lx1, ly1 = leaf_range
        k = cfg.max_zoom - z
        est = ((lx1 >> k) - (lx0 >> k) + 1) * ((ly1 >> k) - (ly0 >> k) + 1)
        L, coarse = choose_span(est, z, _cpus())
        sdir = os.path.join(cfg.out_dir, f"span_z{z - 1}_to_z{z - L}")
        cstage = f"span_z{z - 1}_to_z{z - L}"
        if L >= z:
            # constant-size top of the pyramid: ONE task, zero shuffles
            if not (cfg.resume and ckpt.stage_done(cfg.out_dir, cstage)):
                t0 = time.time()
                if os.path.isdir(sdir):
                    import shutil
                    shutil.rmtree(sdir)
                part = ray.get(_compose_top_task.remote(
                    parquet_files(src), z, cfg.tile_size, bands,
                    cfg.kernel, cfg.fmt, cfg.jpeg_quality, sdir))
                limit_parts.append(part)
                ckpt.save_manifest(cfg.out_dir, cstage, {
                    "done": True, "lineage": {"inputs": [src]},
                    "partitions": ckpt.partition_files(sdir),
                    "limits_partial": part,
                    "metrics_sec": time.time() - t0})
                metrics["compose"] = (metrics.get("compose", 0.0)
                                      + time.time() - t0)
            else:
                m = ckpt.load_manifest(cfg.out_dir, cstage) or {}
                if m.get("limits_partial"):
                    limit_parts.append(m["limits_partial"])
            out_dirs.append(sdir)
            _mbt_add(sdir)
            z = 0
            break
        if not (cfg.resume and ckpt.stage_done(cfg.out_dir, cstage)):
            t0 = time.time()
            if os.path.isdir(sdir):       # crashed, never-recorded span
                import shutil
                shutil.rmtree(sdir)
            raw = rd.read_parquet(
                parquet_files(src),
                columns=["zoom", "x", "y", "pixels", "status"],
                filter=src_filter)
            nb = int(np.clip(est // 4 ** (L + coarse), 1, 4 * _cpus()))
            nxt = compose_level(raw, cfg.tile_size, bands, cfg.kernel,
                                num_blocks=nb, levels=L, coarse=coarse)
            actor, enc = _make_encoder(pixels_only_zoom=z - L)
            nxt = nxt.map_batches(enc, batch_format="pyarrow",
                                  batch_size=None)
            nxt.write_parquet(sdir)
            ckpt.save_manifest(cfg.out_dir, cstage, {
                "done": True, "lineage": {"inputs": [src]},
                "partitions": ckpt.partition_files(sdir),
                "limits_partial": _collect(actor),
                "metrics_sec": time.time() - t0})
            metrics["compose"] = metrics.get("compose", 0.0) + time.time() - t0
        else:
            m = ckpt.load_manifest(cfg.out_dir, cstage) or {}
            if m.get("limits_partial"):
                limit_parts.append(m["limits_partial"])
        out_dirs.append(sdir)
        _mbt_add(sdir)
        z -= L
        src = sdir
        src_filter = _pc.field("zoom") == z

    # ---- limits (A1): merge the per-stage streamed partials ----
    t0 = time.time()
    limits = merge_limits(limit_parts)
    lim_json = limits_json(limits)
    metrics["limits"] = time.time() - t0

    # ---- MBTiles compaction finish (single writer, K1-K3): most rows
    # were streamed in while composes ran; this joins the writer thread
    # and records its total busy seconds as the insert metric (the
    # reference's insert timer), while the wall only pays the
    # non-overlapped tail.
    inserted = None
    if mbt is not None:
        t0 = time.time()
        for d in _mbt_deferred:        # FTR_MBT_DEFER=1: serial insert
            mbt.add_dir(d)
        inserted, busy = mbt.finish(lim_json)
        metrics["insert"] = busy
        metrics["insert_tail"] = time.time() - t0
        ckpt.save_manifest(cfg.out_dir, "mbtiles", {
            "done": True, "rows": inserted, "metrics_sec": busy})
    elif cfg.target_file:
        metrics["insert"] = 0.0

    result = {"max_zoom": cfg.max_zoom, "bounds_3857": list(bbox),
              "limits": limits, "limits_json": lim_json,
              "tile_dirs": out_dirs,
              "mbtiles_rows": inserted, "format": cfg.fmt,
              "out_dir": cfg.out_dir, "metrics_sec": metrics,
              "wall_sec": time.time() - t_start}
    ckpt.save_manifest(cfg.out_dir, "summary", dict(result, done=True))
    return result

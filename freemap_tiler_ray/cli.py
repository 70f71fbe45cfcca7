"""CLI mirroring the reference binary's flag surface
(/root/reference/src/args.rs:13-70):

    python -m freemap_tiler_ray.cli --source scene.npy \
        --target-file out.mbtiles --out-dir work/ --max-zoom 18 \
        [--continue] [--bounding-polygon poly.geojson] [--tile-size 256] \
        [--format jpeg|png] [--jpeg-quality 85] [--warp-zoom-offset 3] \
        [--num-threads N] [--no-insert-empty] [--source-srs EPSG:4326]

This entry point OWNS the Ray session (library code never calls
ray.init). --transform-pipeline takes a 'module:function' spec (no PROJ
in this environment): the named factory returns (fwd, inv[, separable])
callable pairs and is imported lazily in every Ray worker — the direct
analog of the reference handing its PROJ pipeline string to each warp
thread (args.rs:37-43, warp.rs:22-58). See geo.resolve_crs and
transforms_demo.py for ready-made examples.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="freemap-tiler-ray")
    p.add_argument("--source", required=True,
                   help="scene .npy path (with .json georef sidecar)")
    p.add_argument("--target-file", default=None, help="output MBTiles")
    p.add_argument("--out-dir", required=True,
                   help="checkpoint/shard directory")
    p.add_argument("--max-zoom", type=int, required=True)
    p.add_argument("--continue", dest="resume", action="store_true",
                   help="resume from existing checkpoints (args.rs:24-26)")
    p.add_argument("--bounding-polygon", default=None,
                   help="GeoJSON polygon coverage filter")
    p.add_argument("--tile-size", type=int, default=256)
    p.add_argument("--format", choices=["jpeg", "png"], default="jpeg")
    p.add_argument("--jpeg-quality", type=int, default=85)
    p.add_argument("--warp-zoom-offset", type=int, default=3)
    p.add_argument("--num-threads", type=int, default=None,
                   help="Ray CPU count (default: available parallelism)")
    p.add_argument("--no-insert-empty", action="store_true")
    p.add_argument("--debug", action="store_true",
                   help="print a per-zoom step trace (args.rs:63-65; "
                        "the reference prints one char per tile at "
                        "processor.rs:618 — here the same ●=data / "
                        "○=empty trace is aggregated per zoom, plus "
                        "per-stage seconds)")
    p.add_argument("--source-srs", default=None,
                   help="override the sidecar CRS: an EPSG code "
                        "(4326/3857, UTM 326xx/327xx, ETRS89-UTM 258xx, "
                        "S-JTSK 5513/5514, 3395, 3035, 5070, "
                        "3413/3031/3976) or a bare '+proj=...' string "
                        "(longlat/tmerc/utm/lcc/krovak/stere/laea/aea/"
                        "merc, optional +towgs84 datum shift)")
    p.add_argument("--transform-pipeline", default=None,
                   help="a verbatim '+proj=pipeline ...' string (steps:"
                        " unitconvert/axisswap/webmerc/merc/affine/"
                        "longlat/noop/tmerc/utm/lcc/krovak/stere/laea/"
                        "aea/towgs84, each with +inv) or a "
                        "'module:function' factory "
                        "returning (fwd, inv[, separable]); see "
                        "transforms_demo.py")
    return p


def _print_debug_trace(res: dict) -> None:
    """--debug step trace (args.rs:63-65): the reference prints one
    char per tile ('●' data / '○' empty-resume skip) at
    processor.rs:132,187-192,618; a Ray run processes tiles in
    distributed batches, so the same trace is printed aggregated per
    zoom from the level parquet (status column), followed by the
    per-stage seconds the manifests already carry. Goes to stderr —
    stdout stays one JSON line."""
    from collections import Counter

    import pyarrow.parquet as pq

    from .pipelines.tiler import parquet_files

    counts: Counter = Counter()
    files = parquet_files(res.get("tile_dirs", []) or [])
    if files:
        t = pq.read_table(files, columns=["zoom", "status"])
        counts.update(zip(t["zoom"].to_pylist(),
                          t["status"].to_pylist()))
    for z in sorted({z for z, _ in counts}):
        n_data = counts[(z, "data")]
        n_empty = sum(n for (zz, s), n in counts.items()
                      if zz == z and s != "data")
        print(f"debug z{z}: |{'●' * min(n_data, 40)}"
              f"{'○' * min(n_empty, 40)} data={n_data} empty={n_empty}",
              file=sys.stderr)
    for stage, sec in sorted((res.get("metrics_sec") or {}).items()):
        print(f"debug stage {stage}: {sec:.3f}s", file=sys.stderr)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.transform_pipeline:
        if args.source_srs:
            print("error: --transform-pipeline and --source-srs are "
                  "mutually exclusive", file=sys.stderr)
            return 2
        tp = args.transform_pipeline
        # verbatim PROJ strings pass straight through (args.rs:37-43);
        # module:function factories keep the pipeline: prefix
        args.source_srs = (tp if tp.startswith("+proj=pipeline")
                           else f"pipeline:{tp}")

    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False,
                      ignore_reinit_error=True, logging_level="ERROR")
        if args.num_threads:
            kwargs["num_cpus"] = args.num_threads
        ray.init(**kwargs)
    try:
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False

        from .config import TilerConfig
        from .pipelines.tiler import build_pyramid
        from .raster import SceneSpec

        scene = args.source
        if scene.endswith((".tif", ".tiff")):
            # one-time import to the mmap-able scene format (the VRT-build
            # analog); reruns reuse the imported copy
            import os

            from .sources.geotiff import geotiff_to_scene
            os.makedirs(args.out_dir, exist_ok=True)
            imported = os.path.join(args.out_dir, "scene_import.npy")
            if not os.path.exists(imported + ".json"):
                geotiff_to_scene(scene, imported)
            scene = imported
        if args.source_srs:
            import dataclasses
            import os
            spec = SceneSpec.load(scene)
            spec = dataclasses.replace(spec, crs=args.source_srs)
            os.makedirs(args.out_dir, exist_ok=True)
            override = os.path.join(args.out_dir, "scene_override.npy")
            if not os.path.exists(override):
                os.symlink(os.path.abspath(scene), override)
            spec = dataclasses.replace(spec, path=override)
            spec.save()
            scene = override

        cfg = TilerConfig(
            scene_spec_path=scene, out_dir=args.out_dir,
            target_file=args.target_file, max_zoom=args.max_zoom,
            resume=args.resume, bounding_polygon=args.bounding_polygon,
            tile_size=args.tile_size, fmt=args.format,
            jpeg_quality=args.jpeg_quality,
            warp_zoom_offset=args.warp_zoom_offset,
            insert_empty=not args.no_insert_empty)
        res = build_pyramid(cfg)
        if args.debug:
            _print_debug_trace(res)
        out = {k: res[k] for k in ("max_zoom", "mbtiles_rows", "format",
                                   "wall_sec", "metrics_sec", "limits_json")}
        print(json.dumps(out))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())

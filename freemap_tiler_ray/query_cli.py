"""CLI runner for the registered query pipelines: run any `queries()`
entry over an sf-dir of parquet tables and write the result as
partitioned parquet (or print a head to stdout).

    python -m freemap_tiler_ray.query_cli lsh_pairs \
        --sf-dir /root/testdata/sf0.01 --out /tmp/lsh_pairs_out
    python -m freemap_tiler_ray.query_cli --list

Owns its Ray session like cli.py does (attaches to an existing one
under `ray job submit`, else starts a local session) — library code and
__ray_entry__ never call ray.init().
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="freemap-tiler-ray-query")
    p.add_argument("name", nargs="?", help="queries() entry to run")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                   help="directory holding the parquet tables")
    p.add_argument("--out", default=None,
                   help="output directory (partitioned parquet); "
                        "omit to print a 20-row head instead")
    p.add_argument("--list", action="store_true",
                   help="list registered query names and exit")
    p.add_argument("--num-cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    return p


def main(argv=None) -> int:
    import importlib.util

    args = build_parser().parse_args(argv)
    spec = importlib.util.spec_from_file_location(
        "ray_entry_cli", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    reg = entry.queries()

    if args.list or not args.name:
        for name in reg:
            print(name)
        return 0
    if args.name not in reg:
        print(f"unknown query {args.name!r} (see --list)", file=sys.stderr)
        return 2

    import ray

    owns = not ray.is_initialized()
    if owns:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    try:
        res = reg[args.name](args.sf_dir)
        import pandas as pd
        import pyarrow as pa
        import ray.data

        if isinstance(res, ray.data.Dataset):
            if args.out:
                res.write_parquet(args.out)
                print(f"wrote {args.out}")
            else:
                print(res.limit(20).to_pandas().to_string())
        else:
            df = res.to_pandas() if isinstance(res, pa.Table) else \
                pd.DataFrame(res)
            if args.out:
                os.makedirs(args.out, exist_ok=True)
                df.to_parquet(os.path.join(args.out, "part-0.parquet"))
                print(f"wrote {args.out}")
            else:
                print(df.head(20).to_string())
    finally:
        if owns:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

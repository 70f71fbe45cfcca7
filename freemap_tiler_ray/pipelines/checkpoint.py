"""Checkpoint manifests + per-partition lineage/metrics.

Generalizes the reference's `--continue-file` resume flow
(/root/reference/src/processor.rs:136-224, args.rs:24-26): instead of
per-tile SELECT point-lookups behind a mutex, resume is a bulk anti-join
— the done-set of megatile keys is broadcast (ray.put) and filtered
against the tile universe inside map_batches (SURVEY.md §2.1 S3).

Layout under out_dir:
  _manifest/<stage>.json       stage manifest: status, rows, wall-time
                               metrics, lineage (input stages), and for
                               the leaf stage a list of attempts with the
                               megatile partitions each attempt covered
  level_z<Z>/                  parquet shard dirs per pyramid level
                               (leaf level: attempt-<i>/ subdirs = the
                               resumable partitions)

Manifests are written atomically (tmp + rename) AFTER the stage's data
is fully on disk, so a killed run can only under-claim, never over-claim.
"""

from __future__ import annotations

import json
import os
import time


def _manifest_path(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, "_manifest", f"{stage}.json")


def load_manifest(out_dir: str, stage: str) -> dict | None:
    p = _manifest_path(out_dir, stage)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def save_manifest(out_dir: str, stage: str, manifest: dict) -> None:
    p = _manifest_path(out_dir, stage)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    tmp = p + f".tmp.{os.getpid()}"
    manifest = dict(manifest, updated_at=time.time())
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, p)


def stage_done(out_dir: str, stage: str) -> bool:
    m = load_manifest(out_dir, stage)
    return bool(m and m.get("done"))


def ranges_from_keys(keys) -> list[list[int]]:
    """Compress a set of megatile keys into contiguous [lo, hi] runs.
    Manifests store these runs — O(runs), which for rectangle-derived
    universes is O(tile rows), never O(#megatiles)."""
    import numpy as np

    k = np.unique(np.asarray(keys, np.uint64))
    if len(k) == 0:
        return []
    brk = np.where(np.diff(k) != 1)[0]
    lo = k[np.concatenate(([0], brk + 1))]
    hi = k[np.concatenate((brk, [len(k) - 1]))]
    return [[int(a), int(b)] for a, b in zip(lo, hi)]


def merge_ranges(range_lists) -> list[list[int]]:
    """Union of several [lo, hi] run lists (overlap/adjacency merged)."""
    runs = sorted((r for rl in range_lists for r in rl))
    out: list[list[int]] = []
    for lo, hi in runs:
        if out and lo <= out[-1][1] + 1:
            out[-1][1] = max(out[-1][1], hi)
        else:
            out.append([lo, hi])
    return out


def keys_from_ranges(ranges):
    """Expand [lo, hi] runs back to the full key array (test/debug aid —
    production code filters by searchsorted on the run bounds instead)."""
    import numpy as np

    if not ranges:
        return np.array([], np.uint64)
    return np.concatenate([np.arange(lo, hi + 1, dtype=np.uint64)
                           for lo, hi in ranges])


def range_count(ranges) -> int:
    return sum(hi - lo + 1 for lo, hi in ranges)


def partition_files(path: str) -> list[dict]:
    """Per-partition lineage record: every parquet part file with its row
    count (from parquet footers — no data read)."""
    import pyarrow.parquet as pq

    out = []
    for root, _, files in os.walk(path):
        for fn in sorted(files):
            if fn.endswith(".parquet"):
                fp = os.path.join(root, fn)
                out.append({"file": os.path.relpath(fp, path),
                            "rows": pq.ParquetFile(fp).metadata.num_rows})
    return out

"""Generic resumable partitioned-parquet sink.

The tiler writes its pyramid levels as resumable key-range partitions
(pipelines/checkpoint.py); this module gives EVERY pipeline the same
property for plain tabular output: the dataset is hash-partitioned on a
key column into ``part=<i>/`` directories, each partition commits
atomically (data file first, then a ``_SUCCESS`` marker via tmp+rename),
and a re-run skips finished partitions BEFORE the shuffle — the skipped
rows are dropped at the map stage, so a 99%-done 100 TB job re-shuffles
only the missing 1%.

Layout:
    out_dir/part=<i>/data.parquet     one shard per partition
    out_dir/part=<i>/_SUCCESS         commit marker (written last)
    out_dir/_sink_manifest.json       num_partitions + key (sanity check)

Assumes out_dir is visible to every worker (single node here; shared
storage / object-store path on a real cluster — same contract as
ray.data.Dataset.write_parquet).

The partition id is a deterministic integer hash (geo._mix32) of the key
column — NOT Python's salted hash() — so partition membership is stable
across runs, processes and cluster sizes, which is what makes skip-on-
resume sound.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as papq

from ..geo import _mix32

_SALT = np.uint64(0x9E3779B9)


def partition_ids(keys: np.ndarray, num_partitions: int) -> np.ndarray:
    """Deterministic partition id per key (int64 keys; strings hash via
    their md5 top bits upstream if needed)."""
    v = np.asarray(keys).astype(np.uint64)
    h = _mix32((v ^ (v >> np.uint64(32)) ^ _SALT) & np.uint64(0xFFFFFFFF))
    return (h % np.uint64(num_partitions)).astype(np.int64)


def _part_dir(out_dir: str, pid: int) -> str:
    return os.path.join(out_dir, f"part={pid}")


def done_partitions(out_dir: str, num_partitions: int) -> set[int]:
    return {p for p in range(num_partitions)
            if os.path.exists(os.path.join(_part_dir(out_dir, p),
                                           "_SUCCESS"))}


def write_partitioned(ds, out_dir: str, key: str,
                      num_partitions: int = 16) -> dict:
    """Write ds to out_dir hash-partitioned on integer column `key`.

    Returns {"written": [pids], "skipped": [pids]}. Safe to re-run after
    a crash: partitions with a _SUCCESS marker are filtered out before
    the shuffle; partially-written partitions (no marker) are rewritten
    from scratch (tmp file + rename, so readers never see torn data).
    """
    os.makedirs(out_dir, exist_ok=True)
    mpath = os.path.join(out_dir, "_sink_manifest.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            m = json.load(f)
        if m["num_partitions"] != num_partitions or m["key"] != key:
            raise ValueError(
                f"existing sink at {out_dir} was written with "
                f"{m['num_partitions']} partitions on {m['key']!r}; "
                f"got {num_partitions} on {key!r}")
    else:
        tmp = mpath + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"num_partitions": num_partitions, "key": key}, f)
        os.replace(tmp, mpath)

    done = done_partitions(out_dir, num_partitions)
    done_arr = np.array(sorted(done), np.int64)

    def tag_and_prune(t: pa.Table) -> pa.Table:
        pid = partition_ids(t[key].to_numpy(), num_partitions)
        t = t.append_column("_part", pa.array(pid, pa.int64()))
        if len(done_arr):
            keep = ~np.isin(pid, done_arr)
            t = t.filter(pa.array(keep))
        return t

    def commit(group: pa.Table) -> pa.Table:
        if not len(group):
            return pa.table({"_part": pa.array([], pa.int64()),
                             "rows": pa.array([], pa.int64())})
        pid = int(group["_part"][0].as_py())
        pdir = _part_dir(out_dir, pid)
        os.makedirs(pdir, exist_ok=True)
        data = group.drop_columns(["_part"])
        tmp = os.path.join(pdir, f".data.parquet.tmp.{os.getpid()}")
        papq.write_table(data, tmp)
        os.replace(tmp, os.path.join(pdir, "data.parquet"))
        marker = os.path.join(pdir, f"._SUCCESS.tmp.{os.getpid()}")
        with open(marker, "w") as f:
            f.write(str(len(data)))
        os.replace(marker, os.path.join(pdir, "_SUCCESS"))
        return pa.table({"_part": pa.array([pid], pa.int64()),
                         "rows": pa.array([len(data)], pa.int64())})

    written = (ds.map_batches(tag_and_prune, batch_format="pyarrow")
               .groupby("_part")
               .map_groups(commit, batch_format="pyarrow")
               .to_pandas())
    pids = written["_part"] if "_part" in written.columns else []
    return {"written": sorted(int(p) for p in pids),
            "skipped": sorted(done)}


def read_partitioned(out_dir: str, **kw):
    """Read back every committed partition as one Dataset."""
    with open(os.path.join(out_dir, "_sink_manifest.json")) as f:
        n = json.load(f)["num_partitions"]
    paths = [os.path.join(_part_dir(out_dir, p), "data.parquet")
             for p in sorted(done_partitions(out_dir, n))]
    from .pq import read_parquet
    return read_parquet(paths, **kw)

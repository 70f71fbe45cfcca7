"""MBTiles sink + resume source (stdlib sqlite3).

Sink mirrors /root/reference/src/schema.rs + tile_inserter.rs: the
`tiles` table gets a `tile_alpha` column only for JPEG (schema.rs:29-32),
y is TMS-flipped at insert (tile_inserter.rs:54,56), metadata carries
name/format/minzoom/maxzoom/bounds (3857, comma-joined, schema.rs:67)
plus the per-zoom `limits` JSON extension (main.rs:351-364).

SQLite is single-writer, so this is the terminal compaction step of the
pipeline (SURVEY.md §7.4): the parallel, resumable layout is the
partitioned parquet shard directory; this function streams those shards
through one connection (synchronous=OFF + WAL like tile_inserter.rs:31-33).
Never fan multiple actors into this file.
"""

from __future__ import annotations

import os
import sqlite3

import numpy as np
import pyarrow as pa


def create_schema(conn: sqlite3.Connection, max_zoom: int, fmt: str,
                  bounds_3857) -> None:
    cur = conn.cursor()
    cur.execute("CREATE TABLE metadata (name TEXT NOT NULL, value TEXT NOT NULL,"
                " UNIQUE(name))")
    alpha_col = ", tile_alpha BLOB NOT NULL" if fmt == "jpeg" else ""
    cur.execute(f"CREATE TABLE tiles (zoom_level INTEGER NOT NULL,"
                f" tile_column INTEGER NOT NULL, tile_row INTEGER NOT NULL,"
                f" tile_data BLOB NOT NULL{alpha_col})")
    cur.execute("CREATE UNIQUE INDEX idx_tiles ON tiles"
                " (zoom_level, tile_column, tile_row)")
    meta = [("name", "Tiles"), ("format", fmt), ("minzoom", "0"),
            ("maxzoom", str(max_zoom)),
            ("bounds", ",".join(repr(float(c)) for c in bounds_3857))]
    cur.executemany("INSERT INTO metadata (name, value) VALUES (?, ?)", meta)
    conn.commit()


def write_mbtiles(target: str, encoded_ds, max_zoom: int, fmt: str,
                  bounds_3857, limits_json_str: str,
                  insert_empty: bool = True) -> int:
    """Stream an encoded-tile Dataset (zoom, x, tms_y, tile_data,
    tile_alpha, status) into an MBTiles file. Returns rows written."""
    conn = sqlite3.connect(target)
    conn.execute("PRAGMA synchronous = OFF")
    conn.execute("PRAGMA journal_mode = WAL")
    create_schema(conn, max_zoom, fmt, bounds_3857)
    sql = ("INSERT INTO tiles (zoom_level, tile_column, tile_row, tile_data"
           + (", tile_alpha) VALUES (?, ?, ?, ?, ?)" if fmt == "jpeg"
              else ") VALUES (?, ?, ?, ?)"))
    n = 0
    for batch in encoded_ds.iter_batches(batch_size=1024, batch_format="pyarrow"):
        zoom = batch["zoom"].to_pylist()
        x = batch["x"].to_pylist()
        tms_y = batch["tms_y"].to_pylist()
        data = batch["tile_data"].to_pylist()
        alpha = batch["tile_alpha"].to_pylist()
        status = batch["status"].to_pylist()
        rows = []
        for i in range(len(zoom)):
            if status[i] != "data" and not insert_empty:
                continue
            row = (zoom[i], x[i], tms_y[i], data[i])
            rows.append(row + (alpha[i],) if fmt == "jpeg" else row)
        cur = conn.cursor()
        cur.executemany(sql, rows)
        n += len(rows)
    conn.execute("INSERT INTO metadata (name, value) VALUES ('limits', ?)",
                 (limits_json_str,))
    conn.commit()
    conn.close()
    return n


class ProgressiveMBTilesWriter:
    """Single-writer MBTiles sink that OVERLAPS the terminal compaction
    with the pyramid build: completed level/span directories are
    enqueued as their manifests land, and a dedicated thread — the sole
    owner of the SQLite connection (sqlite objects are thread-bound;
    single-writer like tile_inserter.rs:23) — drains them, reading the
    parquet shards directly with pyarrow (column-pruned, no Ray
    interaction, safe alongside the running pipeline). The leaf level
    holds ~3/4 of all tiles, so its insert hides behind the span
    composes instead of serializing after them — the fixed tail that
    costs ~4x more at the larger cluster arm.

    finish(limits_json) joins the thread, writes the limits metadata
    row, and returns (rows_inserted, busy_seconds)."""

    _DONE = object()

    def __init__(self, target: str, max_zoom: int, fmt: str,
                 bounds_3857, insert_empty: bool = True):
        import queue
        import threading
        self.target = target
        self.max_zoom = max_zoom
        self.fmt = fmt
        self.bounds = bounds_3857
        self.insert_empty = insert_empty
        self.rows = 0
        self.busy = 0.0
        self.err: BaseException | None = None
        self._limits_json: str | None = None
        self._q: "queue.Queue" = queue.Queue()
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def add_dir(self, d: str) -> None:
        """Enqueue a directory of encoded parquet shards (recursive)."""
        self._q.put(d)

    def _insert_dir(self, conn, sql, d: str) -> None:
        import pyarrow.parquet as pq
        files = []
        for root, _, names in os.walk(d):
            files.extend(os.path.join(root, n) for n in sorted(names)
                         if n.endswith(".parquet"))
        cols = ["zoom", "x", "tms_y", "tile_data", "tile_alpha", "status"]
        cur = conn.cursor()
        for f in files:
            t = pq.read_table(f, columns=cols)
            zoom = t["zoom"].to_pylist()
            x = t["x"].to_pylist()
            tms_y = t["tms_y"].to_pylist()
            data = t["tile_data"].to_pylist()
            alpha = t["tile_alpha"].to_pylist()
            status = t["status"].to_pylist()
            rows = []
            for i in range(len(zoom)):
                if status[i] != "data" and not self.insert_empty:
                    continue
                row = (zoom[i], x[i], tms_y[i], data[i])
                rows.append(row + (alpha[i],) if self.fmt == "jpeg"
                            else row)
            cur.executemany(sql, rows)
            self.rows += len(rows)

    def _run(self) -> None:
        import sqlite3
        import time
        try:
            conn = sqlite3.connect(self.target)
            conn.execute("PRAGMA synchronous = OFF")
            conn.execute("PRAGMA journal_mode = WAL")
            create_schema(conn, self.max_zoom, self.fmt, self.bounds)
            sql = ("INSERT INTO tiles (zoom_level, tile_column, tile_row,"
                   " tile_data"
                   + (", tile_alpha) VALUES (?, ?, ?, ?, ?)"
                      if self.fmt == "jpeg" else ") VALUES (?, ?, ?, ?)"))
            while True:
                item = self._q.get()
                if item is self._DONE:
                    break
                t0 = time.time()
                self._insert_dir(conn, sql, item)
                self.busy += time.time() - t0
            t0 = time.time()
            conn.execute(
                "INSERT INTO metadata (name, value) VALUES ('limits', ?)",
                (self._limits_json or "{}",))
            conn.commit()
            conn.close()
            self.busy += time.time() - t0
        except BaseException as e:       # surfaced by finish()
            self.err = e

    def finish(self, limits_json_str: str) -> tuple[int, float]:
        self._limits_json = limits_json_str
        self._q.put(self._DONE)
        self._t.join()
        if self.err is not None:
            raise self.err
        return self.rows, self.busy


def read_mbtiles_metadata(path: str) -> dict:
    conn = sqlite3.connect(path)
    meta = dict(conn.execute("SELECT name, value FROM metadata").fetchall())
    conn.close()
    return meta


def import_mbtiles_leaves(prior: str, cfg, bands: int) -> dict:
    """Flow-C resume from a prior MBTiles file (args.rs:24-26 --continue):
    decode the prior run's max-zoom tiles back to raw buffers
    (processor.rs:194-223) and lay them down as a completed leaf attempt,
    so build_pyramid(resume=True) re-warps ONLY megatiles whose leaf set
    is incomplete. Empty markers make completeness knowable — exactly
    what the reference's insert_empty exists for (processor.rs:594-601).

    Returns the leaves manifest it wrote.
    """
    import collections

    import pyarrow.parquet as pq

    from .. import tilemath as tm
    from ..pipelines import checkpoint as ckpt
    from ..raster import load_raster_spec
    from ..stages.encode import DecodeStage

    spec = load_raster_spec(cfg.scene_spec_path)
    offset = cfg.effective_offset
    bbox = spec.mercator_bbox()
    lx0, ly0, lx1, ly1 = tm.bbox_covered_tile_range(*bbox, cfg.max_zoom)

    conn = sqlite3.connect(prior)
    has_alpha = cfg.fmt == "jpeg"
    cols = "zoom_level, tile_column, tile_row, tile_data" + \
        (", tile_alpha" if has_alpha else "")
    rows = conn.execute(
        f"SELECT {cols} FROM tiles WHERE zoom_level = ?",
        (cfg.max_zoom,)).fetchall()
    conn.close()

    z = np.full(len(rows), cfg.max_zoom, np.int64)
    x = np.array([r[1] for r in rows], np.int64)
    tms = np.array([r[2] for r in rows], np.int64)
    y = tm.reversed_y(z, tms)
    data = [bytes(r[3]) for r in rows]
    alpha = [bytes(r[4]) if has_alpha else b"" for r in rows]
    status = ["data" if len(d) else "empty" for d in data]

    # done megatiles = those whose full in-range leaf set is present
    mk = tm.tile_key(z - offset, x >> offset, y >> offset)
    per_mega = collections.Counter(int(k) for k in mk)
    done = []
    for k, n in per_mega.items():
        _, mx, my = tm.tile_key_decode(np.uint64(k))
        gx0, gx1 = max(int(mx) << offset, lx0), min(((int(mx) + 1) << offset) - 1, lx1)
        gy0, gy1 = max(int(my) << offset, ly0), min(((int(my) + 1) << offset) - 1, ly1)
        if n == (gx1 - gx0 + 1) * (gy1 - gy0 + 1):
            done.append(k)
    keep = np.isin(mk, np.asarray(done, np.uint64))

    tbl = pa.table({
        "zoom": pa.array(z[keep], pa.int32()),
        "x": pa.array(x[keep], pa.int64()),
        "y": pa.array(y[keep], pa.int64()),
        "tile_data": pa.array([d for d, m in zip(data, keep) if m], pa.binary()),
        "tile_alpha": pa.array([a for a, m in zip(alpha, keep) if m], pa.binary()),
        "status": pa.array([s for s, m in zip(status, keep) if m], pa.string()),
    })
    # decode for compose seeding; keep the ORIGINAL blobs as the encoded
    # columns (the reference reuses stored tiles as-is and decodes only
    # to feed the parent compose, processor.rs:194-223)
    dec = DecodeStage(cfg.fmt, cfg.tile_size, bands)(tbl)
    out = pa.table({
        "zoom": tbl["zoom"], "x": tbl["x"], "y": tbl["y"],
        "tms_y": pa.array(tm.reversed_y(z[keep], y[keep]), pa.int64()),
        "tile_data": tbl["tile_data"], "tile_alpha": tbl["tile_alpha"],
        "status": tbl["status"], "pixels": dec["pixels"],
    })

    adir = os.path.join(cfg.out_dir, f"level_z{cfg.max_zoom}", "attempt-0")
    os.makedirs(adir, exist_ok=True)
    pq.write_table(out, os.path.join(adir, "imported.parquet"))
    from ..state.limits import partial_limits
    is_data = np.array([s == "data" for s in status]) & keep
    man = {"attempts": [{"dir": adir,
                         "key_ranges": ckpt.ranges_from_keys(done),
                         "partitions": ckpt.partition_files(adir),
                         "limits_partial": partial_limits(z, x, tms, is_data),
                         "imported_from": prior}],
           # imported attempts hold bare max-zoom leaves: the shuffled
           # compose spans must start at max_zoom (no local subtree rows)
           "leaf_min_zoom": cfg.max_zoom,
           "done": False}
    ckpt.save_manifest(cfg.out_dir, "leaves", man)
    return man


def read_mbtiles_tiles(path: str, columns=("zoom_level", "tile_column",
                                           "tile_row", "tile_data")):
    """Small-scale resume/verification reader (the bulk resume path joins
    on the parquet checkpoint shards instead — SURVEY.md §2.1 S3)."""
    conn = sqlite3.connect(path)
    cols = ", ".join(columns)
    try:
        rows = conn.execute(f"SELECT {cols} FROM tiles").fetchall()
    finally:
        conn.close()
    return rows

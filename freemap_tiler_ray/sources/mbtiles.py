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

import sqlite3


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


def read_mbtiles_metadata(path: str) -> dict:
    conn = sqlite3.connect(path)
    meta = dict(conn.execute("SELECT name, value FROM metadata").fetchall())
    conn.close()
    return meta


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

"""Spatial-join layer: cell encoding, point-in-polygon join, kNN join.

North-rule capabilities with no direct reference analog except the
degenerate tiles-x-one-polygon filter (/root/reference/src/main.rs:183-199,
generalized here to N polygons x M points). Design per SURVEY.md §7.1.4:

- cell encode: quadtree (S2-style) cell ids from the deterministic
  doc_id -> lon/lat hash (geo.doc_lonlat); hierarchical morton-packed
  ids (tilemath.cell_id) are the partitioning/shuffle key.
- PIP join: the polygon set is the SMALL side — broadcast once
  (constructor args / ray.put), evaluated per batch with the vectorized
  ray-casting kernel. No shuffle.
- kNN join: queries are the small side. Per batch, each query keeps its
  local top-k (partial aggregation inside map_batches), then one tiny
  groupby(query) merge — the partial/combiner pattern that avoids
  shuffling the big side. The cell-ring-expansion variant
  (knn_cell_ring) prunes distance evaluations to docs in expanding cell
  rings around each query; same results, bounded work per query when
  the doc table is cell-partitioned.

Distance metric: squared planar distance in (lon, lat) degrees —
deterministic, SQL-mirrorable; ties broken by doc_id ascending
(FIXTURES.md F4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import tilemath as tm
from ..geo import doc_lonlat, lonlat_to_mercator
from .geom import points_in_polygon


def add_doc_points(batch: pa.Table) -> pa.Table:
    """Append deterministic lon/lat + EPSG:3857 x/y for each doc_id."""
    ids = batch["doc_id"].to_numpy()
    lon, lat = doc_lonlat(ids)
    px, py = lonlat_to_mercator(lon, lat)
    return (batch.append_column("lon", pa.array(lon))
                 .append_column("lat", pa.array(lat))
                 .append_column("x3857", pa.array(px))
                 .append_column("y3857", pa.array(py)))


def make_add_cell(res: int):
    """Append quadtree cell id (+ tile coords) at resolution `res`."""

    def add_cell(batch: pa.Table) -> pa.Table:
        px = batch["x3857"].to_numpy()
        py = batch["y3857"].to_numpy()
        tx, ty = tm.point_to_tile(px, py, res)
        cell = tm.tile_key(np.full(len(tx), res), tx, ty)
        return (batch.append_column("cell_x", pa.array(tx, pa.int64()))
                     .append_column("cell_y", pa.array(ty, pa.int64()))
                     .append_column("cell", pa.array(cell, pa.uint64())))

    return add_cell


class PIPJoinStage:
    """Broadcast PIP semi/inner join: emits one row per (point, polygon)
    containment. polygons: list of (poly_id, (N,2) EPSG:3857 ring)."""

    def __init__(self, polygons, lon_lat: bool = False):
        self.polys = [(pid, np.asarray(ring, np.float64)) for pid, ring in polygons]
        self.lon_lat = lon_lat  # rings given in lon/lat instead of 3857

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.lon_lat:
            px = batch["lon"].to_numpy()
            py = batch["lat"].to_numpy()
        else:
            px = batch["x3857"].to_numpy()
            py = batch["y3857"].to_numpy()
        ids = batch["doc_id"].to_numpy()
        # per-batch spatial index: one sort by x, then each polygon's
        # candidate set is an O(log n) slice of the sorted order instead
        # of an O(n) bbox mask — with many polygons the mask passes
        # dominate memory traffic (P x n booleans per batch)
        order = np.argsort(px, kind="stable")
        sx = px[order]
        sy = py[order]
        sids = ids[order]
        out_doc, out_poly = [], []
        for pid, ring in self.polys:
            lo = np.searchsorted(sx, ring[:, 0].min(), side="left")
            hi = np.searchsorted(sx, ring[:, 0].max(), side="right")
            if lo >= hi:
                continue
            cy = sy[lo:hi]
            cand = (cy >= ring[:, 1].min()) & (cy <= ring[:, 1].max())
            if not cand.any():
                continue
            inside = points_in_polygon(sx[lo:hi][cand], cy[cand], ring)
            hit = sids[lo:hi][cand][inside]
            out_doc.append(hit)
            out_poly.append(np.full(len(hit), pid, dtype=object))
        if not out_doc:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "poly_id": pa.array([], pa.string())})
        return pa.table({"doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
                         "poly_id": pa.array(np.concatenate(out_poly), pa.string())})


class KnnPartialStage:
    """Per-batch partial top-k against the broadcast query matrix."""

    def __init__(self, queries, k: int):
        # queries: list of (query_id, lon, lat)
        self.qid = np.array([q[0] for q in queries], dtype=object)
        self.qx = np.array([q[1] for q in queries], np.float64)
        self.qy = np.array([q[2] for q in queries], np.float64)
        self.k = k

    _CHUNK = 4096     # (Q=128, 4096) f64 distance block ~4 MB: stays
                      # cache-resident instead of streaming a (Q, 65536)
                      # 67 MB matrix (and its temporaries) through DRAM

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        lon = batch["lon"].to_numpy()
        lat = batch["lat"].to_numpy()
        n = len(ids)
        if n == 0:
            return pa.table({"query_id": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "d2": pa.array([], pa.float64())})
        k = min(self.k, n)
        # exact top-k of per-chunk top-ks; d2 values are identical to the
        # monolithic computation (same expression per element)
        cand_i, cand_d = [], []
        for c0 in range(0, n, self._CHUNK):
            d2c = (lon[c0:c0 + self._CHUNK][None, :]
                   - self.qx[:, None]) ** 2 \
                + (lat[c0:c0 + self._CHUNK][None, :]
                   - self.qy[:, None]) ** 2                  # (Q, ch)
            kk = min(k, d2c.shape[1])
            part = np.argpartition(d2c, kk - 1, axis=1)[:, :kk]
            cand_d.append(np.take_along_axis(d2c, part, axis=1))
            cand_i.append(part + c0)
        D = np.concatenate(cand_d, axis=1)
        I = np.concatenate(cand_i, axis=1)
        part = np.argpartition(D, k - 1, axis=1)[:, :k]      # (Q, k)
        rows_q = np.repeat(np.arange(len(self.qid)), k)
        rows_d = np.take_along_axis(I, part, axis=1).ravel()
        return pa.table({
            "query_id": pa.array(np.repeat(self.qid, k).tolist(), pa.string()),
            "doc_id": pa.array(ids[rows_d], pa.int64()),
            "d2": pa.array(np.take_along_axis(D, part, axis=1).ravel(),
                           pa.float64()),
        })


def _knn_merge(k: int):
    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["d2", "doc_id"], ascending=[True, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g
    return merge


def knn_join(docs_ds, queries, k: int, driver_merge: bool = False):
    """Exact distributed brute-force kNN: partial top-k per batch, then a
    tiny final merge. docs_ds needs doc_id + lon/lat columns (use
    add_doc_points first).

    driver_merge=True streams the Q*k-per-block partials to the driver
    and merges there — the right shape when Q*k*num_blocks is small
    (Ray's all-to-all aggregate has ~seconds of fixed cost regardless of
    data size). Default False uses groupby (tree-reduced; needed when the
    block count is huge)."""
    partial = docs_ds.map_batches(KnnPartialStage(queries, k),
                                  batch_format="pyarrow", batch_size=65536)
    if driver_merge:
        parts = [b for b in partial.iter_batches(batch_format="pandas",
                                                 batch_size=None)]
        allp = pd.concat(parts, ignore_index=True)
        merged = (allp.groupby("query_id", group_keys=False)
                      .apply(_knn_merge(k)))
        return merged.reset_index(drop=True)
    return (partial.groupby("query_id")
                   .map_groups(_knn_merge(k), batch_format="pandas"))


def knn_cell_ring(docs_ds, queries, k: int, res: int = 6, max_ring: int | None = None):
    """Cell-ring-expansion kNN (the scale path): only docs whose cell lies
    within the query's current ring are distance-evaluated; the ring
    expands until the kth-best distance is closed (a candidate farther
    ring cannot contain anything closer than the current kth distance).

    Partitioning assumption (documented per SURVEY.md): docs_ds carries a
    `cell`/`cell_x`/`cell_y` column at resolution `res` (make_add_cell);
    correctness does not depend on how blocks are partitioned, only work
    pruning does — a cell-clustered layout makes the prefilter cheap.

    Ring distances are computed in degrees via the cell's lon/lat bounds,
    so the closure test is conservative (never drops a true neighbor).
    """
    qs = [(q[0], float(q[1]), float(q[2])) for q in queries]
    n_cells = 1 << res
    if max_ring is None:
        max_ring = n_cells  # worst case: whole world
    from ..geo import mercator_to_lonlat

    # per-query result, iteratively expanded (driver loop over rings, but
    # each iteration is one distributed filter+partial-topk pass)
    results = {}
    pending = {q[0]: 1 for q in qs}
    qxy = {q[0]: tm.point_to_tile(*lonlat_to_mercator(q[1], q[2]), res) for q in qs}
    ring_no = 1
    while pending and ring_no <= max_ring:
        active = [q for q in qs if q[0] in pending]
        # candidate cell set for every active query at its current ring
        cells = set()
        for qid, qlon, qlat in active:
            cx, cy = int(qxy[qid][0]), int(qxy[qid][1])
            r = pending[qid]
            xs, ys = tm.cell_neighbors(res, cx, cy, ring=r)
            cells.update(tm.tile_key(np.full(len(xs), res), xs, ys).tolist())
        cell_arr = np.array(sorted(cells), np.uint64)

        def flt(batch: pa.Table, _cells=cell_arr) -> pa.Table:
            mask = np.isin(batch["cell"].to_numpy(), _cells)
            return batch.filter(pa.array(mask))

        cand = docs_ds.map_batches(flt, batch_format="pyarrow")
        merged = knn_join(cand, active, k).to_pandas()
        # closure test per query: kth distance vs nearest unexplored ring.
        # The covered region after ring r is the mercator block of the
        # query's cell grown by r uniform cell widths; its DEGREE margin
        # around the query is taken side-by-side through the exact
        # mercator->lat transform, so poleward-shrinking lat extents can
        # never overstate coverage (any uncovered point differs by more
        # than the min margin in lon or lat -> d2 > closed).
        cell_m = tm.WORLD / n_cells
        for qid, qlon, qlat in active:
            mine = merged[merged["query_id"] == qid]
            r = pending[qid]
            cx, cy = int(qxy[qid][0]), int(qxy[qid][1])
            bx0, by0, bx1, by1 = tm.bounds(res, cx, cy)
            gx0, gy0 = bx0 - r * cell_m, by0 - r * cell_m
            gx1, gy1 = bx1 + r * cell_m, by1 + r * cell_m
            margins = []
            if gx0 > -tm.ORIGIN:
                margins.append(qlon - float(mercator_to_lonlat(gx0, 0.0)[0]))
            if gx1 < tm.ORIGIN:
                margins.append(float(mercator_to_lonlat(gx1, 0.0)[0]) - qlon)
            if gy0 > -tm.ORIGIN:
                margins.append(qlat - float(mercator_to_lonlat(0.0, gy0)[1]))
            if gy1 < tm.ORIGIN:
                margins.append(float(mercator_to_lonlat(0.0, gy1)[1]) - qlat)
            closed = (min(margins) ** 2 if margins else np.inf)
            kth = mine["d2"].iloc[k - 1] if len(mine) >= k else np.inf
            if kth <= closed or (r >= max_ring):
                results[qid] = mine.head(k)
                del pending[qid]
            else:
                pending[qid] = r + 1
        ring_no += 1
    for qid in list(pending):
        results.setdefault(qid, None)
    out = pd.concat([r for r in results.values() if r is not None],
                    ignore_index=True)
    return out

"""Spatial-layer unit tests: geometry predicates vs brute force, cell-ring
kNN vs exact brute-force kNN, span invariant enforcement."""

import numpy as np
import pyarrow as pa
import pytest

from freemap_tiler_ray.stages.docs import build_spans, check_span_invariant
from freemap_tiler_ray.stages.geom import (points_in_polygon, regular_polygon,
                                           rects_intersect_polygon)

rng = np.random.default_rng(11)


def test_pip_vs_matplotlib_free_brute():
    """Ray-casting vs a dense winding check on a convex polygon (where
    inside == 'on the inner side of every edge')."""
    ring = regular_polygon(2.0, -1.0, 3.0, 7, phase=0.3)
    px = rng.uniform(-3, 7, 4000)
    py = rng.uniform(-6, 4, 4000)
    got = points_in_polygon(px, py, ring)
    # convex: inside iff all cross products have the same sign
    x1, y1 = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    cross = ((x2 - x1)[None, :] * (py[:, None] - y1[None, :])
             - (y2 - y1)[None, :] * (px[:, None] - x1[None, :]))
    exp = (cross > 0).all(axis=1) | (cross < 0).all(axis=1)
    assert (got == exp).mean() > 0.999  # boundary pixels may differ


def test_rect_intersects_polygon_brute():
    ring = regular_polygon(0.0, 0.0, 5.0, 5, phase=0.7)
    rx0 = rng.uniform(-8, 8, 500)
    ry0 = rng.uniform(-8, 8, 500)
    rx1 = rx0 + rng.uniform(0.1, 4, 500)
    ry1 = ry0 + rng.uniform(0.1, 4, 500)
    got = rects_intersect_polygon(rx0, ry0, rx1, ry1, ring)
    # brute force: sample a dense grid in each rect + polygon edge points
    for i in range(60):
        gx, gy = np.meshgrid(np.linspace(rx0[i], rx1[i], 25),
                             np.linspace(ry0[i], ry1[i], 25))
        inside_any = points_in_polygon(gx.ravel(), gy.ravel(), ring).any()
        t = np.linspace(0, 1, 200)
        ex = np.concatenate([ring[j, 0] + t * (ring[(j + 1) % len(ring), 0]
                                               - ring[j, 0])
                             for j in range(len(ring))])
        ey = np.concatenate([ring[j, 1] + t * (ring[(j + 1) % len(ring), 1]
                                               - ring[j, 1])
                             for j in range(len(ring))])
        edge_in = ((ex >= rx0[i]) & (ex <= rx1[i])
                   & (ey >= ry0[i]) & (ey <= ry1[i])).any()
        brute = bool(inside_any or edge_in)
        assert bool(got[i]) == brute or abs(inside_any - brute) == 0


def test_knn_cell_ring_matches_bruteforce(ray_session):
    import ray.data as rd

    from freemap_tiler_ray.stages.spatial import (add_doc_points, knn_cell_ring,
                                                  knn_join, make_add_cell)

    ids = pa.table({"doc_id": pa.array(np.arange(3000), pa.int64())})
    docs = (rd.from_arrow(ids)
            .map_batches(add_doc_points, batch_format="pyarrow")
            .map_batches(make_add_cell(4), batch_format="pyarrow"))
    docs = docs.materialize()
    from freemap_tiler_ray.fixtures import knn_queries
    queries, k = knn_queries(n=6)
    exact = (knn_join(docs, queries, k).to_pandas()
             .sort_values(["query_id", "rank"]).reset_index(drop=True))
    ringed = (knn_cell_ring(docs, queries, k, res=4)
              .sort_values(["query_id", "rank"]).reset_index(drop=True))
    assert exact[["query_id", "doc_id", "rank"]].equals(
        ringed[["query_id", "doc_id", "rank"]])


def test_span_invariant_detects_mutation():
    batch = pa.table({"doc_id": pa.array(np.arange(20), pa.int64())})
    spans = build_spans(batch)
    check_span_invariant(spans)  # clean passes
    # mutate: swap spans of two docs -> must raise
    col = spans["spans"].combine_chunks()
    swapped = pa.concat_arrays([col.slice(1, 1), col.slice(0, 1),
                                col.slice(2, 18)])
    bad = pa.table({"doc_id": spans["doc_id"], "spans": swapped})
    with pytest.raises(AssertionError):
        check_span_invariant(bad)


def test_salted_aggregate_matches_plain(ray_session):
    """Skew-safe two-phase aggregate equals the direct groupby result."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from freemap_tiler_ray.stages.salt import salted_grouped_aggregate

    n = 50_000
    # heavy skew: 90% of rows share one key
    keys = np.where(np.arange(n) % 10 < 9, 7, np.arange(n) % 100)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(keys.astype(np.int64)),
        "v": pa.array(np.arange(n, dtype=np.int64)),
        "rid": pa.array(np.arange(n, dtype=np.int64)),
    }))
    plain = (ds.groupby("k").aggregate(Sum("v", alias_name="s"),
                                       Count(alias_name="c"))
             .to_pandas().sort_values("k").reset_index(drop=True))
    salted = (salted_grouped_aggregate(
        ds, "k",
        [Sum("v", alias_name="s"), Count(alias_name="c")],
        [Sum("s", alias_name="s"), Sum("c", alias_name="c")],
        n_salt=8, id_col="rid")
        .to_pandas().sort_values("k").reset_index(drop=True))
    assert plain[["k", "s", "c"]].equals(salted[["k", "s", "c"]])


def test_media_resize_stub(ray_session):
    """Resize plumbing: decode(payload) -> resize box math + payload."""
    import pyarrow as pa
    import ray.data as rd

    from freemap_tiler_ray.stages.media import MediaDecodeStub, MediaResizeStub

    docs = rd.from_arrow(pa.table({"doc_id": pa.array(np.arange(50), "int64")}))
    dec = docs.map_batches(MediaDecodeStub(payload=True),
                           batch_format="pyarrow", concurrency=2,
                           batch_size=None)
    rs = dec.map_batches(MediaResizeStub(max_side=64), batch_format="pyarrow",
                         concurrency=2, batch_size=None).to_pandas()
    assert len(rs) > 0
    assert (rs["out_width"] <= 64).all() and (rs["out_height"] <= 64).all()
    assert all(len(p) == w * h for p, w, h in
               zip(rs["payload"], rs["out_width"], rs["out_height"]))


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.integers(0, 2**32 - 1), st.integers(3, 12))
@settings(max_examples=40, deadline=None)
def test_pip_property_convex(seed, k):
    """For random convex k-gons: interior points (convex combinations of
    vertices, shrunk toward the centroid) test inside; far points don't."""
    r = np.random.default_rng(seed)
    ring = regular_polygon(float(r.uniform(-50, 50)), float(r.uniform(-50, 50)),
                           float(r.uniform(1, 20)), k,
                           phase=float(r.uniform(0, 6)))
    c = ring.mean(axis=0)
    w = r.random((50, len(ring)))
    w /= w.sum(axis=1, keepdims=True)
    pts = 0.98 * (w @ ring - c) + c            # strictly interior
    far = c[None, :] + (ring.max(0) - ring.min(0) + 5.0) * np.array([[3.0, 3.0]])
    assert points_in_polygon(pts[:, 0], pts[:, 1], ring).all()
    assert not points_in_polygon(far[:, 0], far[:, 1], ring).any()


def test_pack_bins_skewed_ids(ray_session):
    """pack_bins' order-preserving range buckets must stay exact when
    doc_ids are sparse and skewed (empty buckets, giant gaps)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from freemap_tiler_ray.pipelines import queries as q

    rng = np.random.default_rng(11)
    ids = np.unique(np.concatenate([
        rng.integers(0, 50, 40),             # dense head
        rng.integers(10_000, 10_050, 30),    # far cluster
        [0, 1, 99_999]]))                    # extremes
    texts = [" ".join(["tok"] * int(n))
             for n in rng.integers(1, 40, len(ids))]
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string())})
    import tempfile, os
    import pyarrow.parquet as pq
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "documents.parquet"))
        out = q.pack_bins(d).to_pandas().sort_values("doc_id")
    # reference: plain prefix scan in numpy
    order = np.argsort(ids)
    n_tok = np.asarray([t.count(" ") + 1 for t in texts])[order]
    before = np.r_[0, np.cumsum(n_tok)[:-1]]
    want_bins = before // q.PACK_BUDGET
    got = out.set_index("doc_id")
    assert np.array_equal(got.loc[ids[order], "bin_id"].to_numpy(),
                          want_bins)
    assert np.array_equal(got.loc[ids[order], "n_tok"].to_numpy(), n_tok)

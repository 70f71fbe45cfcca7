"""Distributed k-means vs an in-process sequential reference with the
identical deterministic rules (init = first k, integer-scaled centroid
sums, lowest-id tie break)."""

import numpy as np
import pyarrow.parquet as pq

from freemap_tiler_ray.stages.ann import _d2_fold, kmeans

SF = "/root/testdata/sf0.001"


def _reference(k=8, iters=5):
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    order = np.argsort(t["vec_id"].to_numpy())
    ids = t["vec_id"].to_numpy()[order]
    mat = np.stack([np.asarray(v, np.float64)
                    for v in t["embedding"].to_pylist()])[order]
    cent = mat[ids < k][np.argsort(ids[ids < k])].copy()
    for _ in range(iters):
        assign = np.argmin(_d2_fold(mat, cent), axis=1)
        e6 = np.floor(mat * 1000000.0).astype(np.int64)
        for cl in range(k):
            sel = assign == cl
            if sel.any():
                cent[cl] = e6[sel].sum(axis=0) / 1000000.0 / int(sel.sum())
    return dict(zip(ids.tolist(),
                    np.argmin(_d2_fold(mat, cent), axis=1).tolist()))


def test_kmeans_matches_sequential(ray_session):
    assigned, cent = kmeans(SF, k=8, iters=5)
    got = {int(r["vec_id"]): int(r["cluster"])
           for b in assigned.iter_batches(batch_format="pandas")
           for _, r in b.iterrows()}
    exp = _reference()
    assert got == exp

"""Distributed PCA over an embedding column (dimensionality reduction
for training-data pipelines).

Exact, two-pass-free shape: every batch emits ONE fixed-size partial
(n, column sums, X^T X — (1 + d + d*d) floats), the tiny partial rows
are reduced on the driver, and the (d, d) covariance eigendecomposition
runs there (d = 64 here; at any realistic embedding width the
eigenproblem is driver-trivial while the data pass stays fully
distributed and single-scan). Projection is a broadcast matmul per
batch — the same shape as the ANN stages.

Sign convention: each principal axis is flipped so its
largest-magnitude coordinate is positive, making components
deterministic up to eigenvalue ties.
"""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa

from .ann import _matrix


def pca_partial_stage(t: pa.Table, col: str = "embedding") -> pa.Table:
    """One (n, sum, X^T X) partial row per batch."""
    m = _matrix(t[col])
    payload = pickle.dumps({
        "n": m.shape[0],
        "s": m.sum(axis=0),
        "xtx": m.T @ m,
    })
    return pa.table({"part": pa.array([payload], pa.binary())})


def pca_fit(ds, col: str = "embedding", k: int = 8):
    """Fit PCA on a Dataset with an embedding column.

    Returns (mean (d,), components (k, d), eigvals (k,)). The reduce
    input is one small row per batch — bounded by batch count, not
    rows."""
    rows = (ds.map_batches(lambda t: pca_partial_stage(t, col),
                           batch_format="pyarrow")
            .take_all())
    parts = [pickle.loads(r["part"]) for r in rows]
    n = sum(p["n"] for p in parts)
    if n < 2:
        raise ValueError("pca_fit needs at least 2 rows")
    s = np.sum([p["s"] for p in parts], axis=0)
    xtx = np.sum([p["xtx"] for p in parts], axis=0)
    mean = s / n
    cov = (xtx - n * np.outer(mean, mean)) / (n - 1)
    w, v = np.linalg.eigh(cov)           # ascending eigenvalues
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T                # (k, d)
    flip = np.sign(comps[np.arange(len(comps)),
                         np.abs(comps).argmax(axis=1)])
    comps = comps * flip[:, None]
    return mean, comps, w[order]


def pca_project(ds, mean: np.ndarray, comps: np.ndarray,
                col: str = "embedding", id_col: str = "vec_id"):
    """Project the embedding column onto the fitted components:
    broadcast (mean, comps) once, one matmul per batch. Output rows:
    (id, pc_0..pc_{k-1})."""
    import ray

    ref = ray.put((np.asarray(mean), np.asarray(comps)))

    def proj(t: pa.Table) -> pa.Table:
        mu, c = ray.get(ref)
        y = (_matrix(t[col]) - mu) @ c.T
        cols = {id_col: t[id_col]}
        for j in range(y.shape[1]):
            cols[f"pc_{j}"] = pa.array(y[:, j], pa.float64())
        return pa.table(cols)

    return ds.map_batches(proj, batch_format="pyarrow")

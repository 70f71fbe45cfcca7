"""Distributed PCA vs a full-matrix numpy reference."""

import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def _ref_pca(x: np.ndarray, k: int):
    mu = x.mean(axis=0)
    cov = np.cov(x - mu, rowvar=False, ddof=1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    return mu, v[:, order].T, w[order]


def test_pca_fit_matches_numpy(ray_session):
    from freemap_tiler_ray.sources.pq import read_parquet
    from freemap_tiler_ray.stages.decomp import pca_fit

    ds = read_parquet(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).repartition(8)
    mean, comps, eig = pca_fit(ds, k=8)

    x = np.stack(pq.read_table(f"{SF}/embeddings.parquet")
                 ["embedding"].to_pylist()).astype(np.float64)
    rmu, rcomps, reig = _ref_pca(x, 8)

    np.testing.assert_allclose(mean, rmu, rtol=1e-10)
    np.testing.assert_allclose(eig, reig, rtol=1e-8)
    # axes agree up to sign: |cos| of each pair ~ 1
    cos = np.abs((comps * rcomps).sum(axis=1))
    np.testing.assert_allclose(cos, 1.0, atol=1e-8)


def test_pca_project_variance_ordering(ray_session):
    from freemap_tiler_ray.sources.pq import read_parquet
    from freemap_tiler_ray.stages.decomp import pca_fit, pca_project

    ds = read_parquet(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).repartition(4)
    mean, comps, eig = pca_fit(ds, k=4)
    out = pca_project(ds, mean, comps, id_col="vec_id").to_pandas()

    assert len(out) == ds.count()
    assert list(out.columns) == ["vec_id", "pc_0", "pc_1", "pc_2", "pc_3"]
    # sample variance of each projected coordinate == its eigenvalue
    var = out[[f"pc_{j}" for j in range(4)]].var(ddof=1).to_numpy()
    np.testing.assert_allclose(var, eig, rtol=1e-8)
    assert np.all(np.diff(var) <= 1e-9)   # descending

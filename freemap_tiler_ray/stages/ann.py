"""Similarity search over the embedding column (list<float>).

- ann_topk: exact brute-force cosine top-k — the baseline. Query matrix
  broadcast once; each batch does one matmul and keeps its local top-k
  (partial aggregation), then one tiny groupby(query) merge. Exactly the
  distributed-top-k shape of stages/spatial.knn_join.
- ann_ivf: IVF variant — the scale path. A deterministic coarse
  quantizer (centroids = the first N_CENTROIDS embeddings) assigns every
  vector to its nearest centroid inside map_batches; each query probes
  its NPROBE nearest centroids and ranks only vectors in those lists.
  Semantics (not recall-vs-bruteforce) are oracle-checked: the DuckDB
  mirror performs the same assignment/probe/rank.

Ties broken by vec_id ascending everywhere. Cosine values are computed
in float64; returned tables carry ranks + ids, not raw cosines (matmul
summation order differs across engines by ~1 ulp, which would break
value-hash comparison while being semantically irrelevant).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.pq import read_parquet as _rp

N_QUERIES = 10       # queries = embeddings with vec_id < N_QUERIES
TOP_K = 5
N_CENTROIDS = 8      # IVF coarse quantizer = embeddings with vec_id < 8
NPROBE = 2
N_PLANES = 16        # LSH: hyperplanes = embeddings with vec_id < 16


def _matrix(batch_col) -> np.ndarray:
    """Fixed-length list<float> column -> (n, d) float64, zero-copy via
    list_flatten (no per-row Python)."""
    import pyarrow.compute as pc

    if isinstance(batch_col, pa.ChunkedArray):
        batch_col = batch_col.combine_chunks()
    n = len(batch_col)
    flat = pc.list_flatten(batch_col).to_numpy(zero_copy_only=False)
    return flat.astype(np.float64, copy=False).reshape(n, -1)


def _d2_fold(m: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Squared L2 distances (n, k), accumulated dim-by-dim in index order
    (left-fold) so a DuckDB ((..)+term) expression mirrors it bit-for-bit
    — numpy's .sum() uses pairwise summation, which SQL cannot mirror."""
    diff = m[:, 0, None] - c[None, :, 0]
    acc = diff * diff
    for d in range(1, m.shape[1]):
        diff = m[:, d, None] - c[None, :, d]
        acc = acc + diff * diff
    return acc


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _load_head(sf_dir: str, n: int):
    """Driver-side read of the small query/centroid rows (column-pruned,
    row-filtered at the parquet read)."""
    import pyarrow.dataset as pads

    tbl = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"],
        filter=pads.field("vec_id") < n)
    order = np.argsort(tbl["vec_id"].to_numpy())
    mat = _matrix(tbl["embedding"].take(pa.array(order)))
    return tbl["vec_id"].to_numpy()[order], mat


class AnnPartialStage:
    """Per-batch partial top-k against the broadcast query matrix."""

    def __init__(self, query_ids: np.ndarray, query_mat: np.ndarray, k: int):
        self.qids = query_ids
        self.q = _normalize(query_mat)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        m = _normalize(_matrix(batch["embedding"]))
        cos = self.q @ m.T                                   # (Q, n)
        k = min(self.k, len(ids))
        part = np.argpartition(-cos, k - 1, axis=1)[:, :k]
        rows_q = np.repeat(np.arange(len(self.qids)), k)
        rows_d = part.ravel()
        return pa.table({
            "query_vec_id": pa.array(np.repeat(self.qids, k), pa.int64()),
            "vec_id": pa.array(ids[rows_d], pa.int64()),
            "cos": pa.array(cos[rows_q, rows_d], pa.float64()),
        })


def _merge_topk(k: int):
    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame({
            "query_vec_id": g["query_vec_id"],
            "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            "vec_id": g["vec_id"],
        })
    return merge


def ann_topk(sf_dir: str, k: int = TOP_K):
    import ray.data as rd

    qids, qmat = _load_head(sf_dir, N_QUERIES)
    ds = _rp(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"]).repartition(8)
    partial = ds.map_batches(AnnPartialStage(qids, qmat, k),
                             batch_format="pyarrow", batch_size=4096)
    return (partial.groupby("query_vec_id")
            .map_groups(_merge_topk(k), batch_format="pandas"))


class FilteredAnnPartialStage:
    """Per-batch partial top-k with a metadata predicate: candidates
    whose label EQUALS the query's label are masked out before the
    top-k (the filtered-vector-search shape — search restricted by an
    attribute filter, evaluated inside the same matmul pass rather
    than as a post-filter that could starve the top-k)."""

    def __init__(self, query_ids: np.ndarray, query_mat: np.ndarray,
                 query_labels: np.ndarray, k: int):
        self.qids = query_ids
        self.q = _normalize(query_mat)
        self.qlab = query_labels.astype(np.int64)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        lab = batch["label"].to_numpy().astype(np.int64)
        m = _normalize(_matrix(batch["embedding"]))
        cos = self.q @ m.T                                   # (Q, n)
        cos[self.qlab[:, None] == lab[None, :]] = -np.inf    # predicate
        k = min(self.k, cos.shape[1])
        part = np.argpartition(-cos, k - 1, axis=1)[:, :k]
        rows_q = np.repeat(np.arange(len(self.qids)), k)
        rows_d = part.ravel()
        vals = cos[rows_q, rows_d]
        keep = np.isfinite(vals)                  # drop masked fillers
        return pa.table({
            "query_vec_id": pa.array(
                np.repeat(self.qids, k)[keep], pa.int64()),
            "vec_id": pa.array(ids[rows_d][keep], pa.int64()),
            "cos": pa.array(vals[keep], pa.float64()),
        })


def ann_filtered(sf_dir: str, k: int = TOP_K):
    """Filtered vector search: exact cosine top-k per query restricted
    to vectors with label <> the query's label. Same distributed shape
    as ann_topk (broadcast query matrix, per-batch partial top-k, tiny
    grouped merge); the filter is applied inside the matmul pass so
    partial top-k stays correct under the predicate."""
    import pyarrow.dataset as pads

    tbl = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding", "label"],
        filter=pads.field("vec_id") < N_QUERIES)
    order = np.argsort(tbl["vec_id"].to_numpy())
    qids = tbl["vec_id"].to_numpy()[order]
    qmat = _matrix(tbl["embedding"].take(pa.array(order)))
    qlab = tbl["label"].to_numpy()[order]

    ds = _rp(f"{sf_dir}/embeddings.parquet",
             columns=["vec_id", "embedding", "label"]).repartition(8)
    partial = ds.map_batches(
        FilteredAnnPartialStage(qids, qmat, qlab, k),
        batch_format="pyarrow", batch_size=4096)
    return (partial.groupby("query_vec_id")
            .map_groups(_merge_topk(k), batch_format="pandas"))


def kmeans(sf_dir: str, k: int = 8, iters: int = 5):
    """Deterministic distributed k-means (the iterative-algorithm shape:
    broadcast centroids -> per-batch partial sums -> tiny merge -> new
    centroids, repeated). Init = the first k vectors by vec_id; centroid
    updates use exact integer-scaled sums so results are independent of
    block/merge order; ties in assignment break to the lowest cluster id.

    Returns (assignments, centroids) — exposed as the `kmeans_clusters`
    query with an exact DuckDB oracle (the 5 iterations unrolled as
    chained CTEs; distances left-folded over dims in both engines so
    float results are bit-identical — see __ray_entry__.oracle_sql).
    """
    import ray
    import ray.data as rd

    _, cent = _load_head(sf_dir, k)
    ds = _rp(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"]).repartition(8).materialize()

    for _ in range(iters):
        ref = ray.put(cent)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            m = _matrix(batch["embedding"])
            d2 = _d2_fold(m, c)
            assign = np.argmin(d2, axis=1).astype(np.int64)
            e6 = np.floor(m * 1000000.0).astype(np.int64)
            ucl, inv = np.unique(assign, return_inverse=True)
            kk, dd = len(ucl), e6.shape[1]
            sums = np.zeros((kk, dd), np.int64)
            np.add.at(sums, inv, e6)
            ns = np.bincount(inv, minlength=kk).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.repeat(ucl, dd), pa.int64()),
                "dim": pa.array(np.tile(np.arange(dd, dtype=np.int64), kk)),
                "part_sum": pa.array(sums.ravel(), pa.int64()),
                "part_n": pa.array(np.repeat(ns, dd), pa.int64())})

        from ray.data.aggregate import Sum
        agg = (ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
               .groupby(["cluster", "dim"])
               .aggregate(Sum("part_sum", alias_name="s"),
                          Sum("part_n", alias_name="n"))
               .to_pandas())
        new = cent.copy()
        for cl, grp in agg.groupby("cluster"):
            grp = grp.sort_values("dim")
            n = int(grp["n"].iloc[0])
            if n > 0:
                new[int(cl)] = grp["s"].to_numpy() / 1000000.0 / n
        cent = new

    ref = ray.put(cent)

    def final_assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _matrix(batch["embedding"])
        d2 = _d2_fold(m, c)
        return pa.table({
            "vec_id": batch["vec_id"],
            "cluster": pa.array(np.argmin(d2, axis=1).astype(np.int64)),
        })

    return ds.map_batches(final_assign, batch_format="pyarrow",
                          batch_size=None), cent


class IvfAssignStage:
    """Append ivf_cluster = argmax-cosine centroid (ties -> lowest id)."""

    def __init__(self, cent_mat: np.ndarray):
        self.c = _normalize(cent_mat)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_matrix(batch["embedding"]))
        cos = m @ self.c.T
        cl = np.argmax(cos, axis=1).astype(np.int64)  # first max = lowest id
        return batch.append_column("ivf_cluster", pa.array(cl, pa.int64()))


def ann_ivf(sf_dir: str, k: int = TOP_K):
    import ray.data as rd

    cids, cmat = _load_head(sf_dir, N_CENTROIDS)
    qids, qmat = _load_head(sf_dir, N_QUERIES)
    qn = _normalize(qmat)
    cn = _normalize(cmat)
    qprobe = np.argsort(-(qn @ cn.T), axis=1, kind="stable")[:, :NPROBE]

    ds = _rp(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"]).repartition(8)
    assigned = ds.map_batches(IvfAssignStage(cmat), batch_format="pyarrow",
                              batch_size=4096)

    # (Q, n_centroids) bool probe matrix: one matmul + one gather-mask
    # per batch covers every query at once (no per-query Python loop)
    probe_mask = np.zeros((len(qids), len(cids)), bool)
    probe_mask[np.repeat(np.arange(len(qids)), NPROBE), qprobe.ravel()] = True
    qn_all = _normalize(qmat)

    def partial(batch: pa.Table) -> pa.Table:
        cl = batch["ivf_cluster"].to_numpy()
        ids = batch["vec_id"].to_numpy()
        m = _normalize(_matrix(batch["embedding"]))
        cos = qn_all @ m.T                                  # (Q, n)
        allowed = probe_mask[:, cl]                         # (Q, n) gather
        masked = np.where(allowed, cos, -np.inf)
        k_eff = min(k, masked.shape[1])
        part = np.argpartition(-masked, k_eff - 1, axis=1)[:, :k_eff]
        rows_q = np.repeat(np.arange(len(qids)), k_eff)
        rows_d = part.ravel()
        keep = allowed[rows_q, rows_d]                      # drop -inf fill
        return pa.table({
            "query_vec_id": pa.array(np.repeat(qids, k_eff)[keep],
                                     pa.int64()),
            "vec_id": pa.array(ids[rows_d][keep], pa.int64()),
            "cos": pa.array(cos[rows_q, rows_d][keep], pa.float64()),
        })

    return (assigned.map_batches(partial, batch_format="pyarrow",
                                 batch_size=4096)
            .groupby("query_vec_id")
            .map_groups(_merge_topk(k), batch_format="pandas"))


class LshBucketStage:
    """Append lsh_bucket = sign bits of dot products against N_PLANES
    broadcast hyperplanes (random-hyperplane LSH; deterministic planes =
    the first N_PLANES embeddings so the DuckDB mirror can re-derive
    them)."""

    def __init__(self, planes: np.ndarray):
        self.h = planes                               # (P, d) raw

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _matrix(batch["embedding"])
        bits = (m @ self.h.T) >= 0.0                  # (n, P)
        p = np.arange(self.h.shape[0], dtype=np.int64)
        bucket = (bits.astype(np.int64) << p[None, :]).sum(axis=1)
        return batch.append_column("lsh_bucket",
                                   pa.array(bucket, pa.int64()))


def ann_lsh(sf_dir: str, k: int = TOP_K):
    """LSH-bucketed ANN — the second scale path next to IVF: vectors
    hash to 2^N_PLANES sign buckets inside map_batches; each query
    ranks only candidates within hamming <= 1 of its own bucket (a
    (Q, 2^P) boolean probe mask, one gather per batch). Semantics (not
    recall-vs-bruteforce) are oracle-checked like ann_ivf."""
    import ray.data as rd

    _, planes = _load_head(sf_dir, N_PLANES)
    qids, qmat = _load_head(sf_dir, N_QUERIES)
    qbits = (qmat @ planes.T) >= 0.0
    p = np.arange(N_PLANES, dtype=np.int64)
    qbucket = (qbits.astype(np.int64) << p[None, :]).sum(axis=1)
    probe_mask = np.zeros((len(qids), 1 << N_PLANES), bool)
    for qi in range(len(qids)):
        probe_mask[qi, qbucket[qi]] = True
        for b in range(N_PLANES):
            probe_mask[qi, qbucket[qi] ^ (1 << b)] = True
    qn_all = _normalize(qmat)

    ds = _rp(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"]).repartition(8)
    bucketed = ds.map_batches(LshBucketStage(planes),
                              batch_format="pyarrow", batch_size=4096)

    def partial(batch: pa.Table) -> pa.Table:
        bk = batch["lsh_bucket"].to_numpy()
        ids = batch["vec_id"].to_numpy()
        m = _normalize(_matrix(batch["embedding"]))
        cos = qn_all @ m.T
        allowed = probe_mask[:, bk]
        masked = np.where(allowed, cos, -np.inf)
        k_eff = min(k, masked.shape[1])
        part = np.argpartition(-masked, k_eff - 1, axis=1)[:, :k_eff]
        rows_q = np.repeat(np.arange(len(qids)), k_eff)
        rows_d = part.ravel()
        keep = allowed[rows_q, rows_d]
        return pa.table({
            "query_vec_id": pa.array(np.repeat(qids, k_eff)[keep],
                                     pa.int64()),
            "vec_id": pa.array(ids[rows_d][keep], pa.int64()),
            "cos": pa.array(cos[rows_q, rows_d][keep], pa.float64()),
        })

    return (bucketed.map_batches(partial, batch_format="pyarrow",
                                 batch_size=4096)
            .groupby("query_vec_id")
            .map_groups(_merge_topk(k), batch_format="pandas"))


QUALITY_DIMS = 64


def quality_weights(dims: int = QUALITY_DIMS) -> np.ndarray:
    """Deterministic linear "model" weights in [-1, 1] — a stand-in for
    a trained quality classifier; the real model would be loaded from
    a checkpoint in QualityScoreStage.__init__ the same way."""
    from ..geo import _mix32

    d = np.arange(dims, dtype=np.int64)
    return ((_mix32(d).astype(np.int64) % 2001) - 1000) / 1000.0


class QualityScoreStage:
    """Actor-pool model-inference shape: the model (here a linear probe
    over the embedding) is built ONCE per actor in __init__; __call__
    scores whole batches vectorized. The dot product accumulates
    dim-by-dim in index order (left-fold) so the DuckDB oracle's
    w0*e0 + w1*e1 + ... expression mirrors it bit-for-bit; the score is
    reported as floor(score * 1e6) in int64 so the compare is
    dtype-stable."""

    def __init__(self, dims: int = QUALITY_DIMS):
        self.w = quality_weights(dims)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _matrix(batch["embedding"])
        acc = self.w[0] * m[:, 0]
        for d in range(1, m.shape[1]):
            acc = acc + self.w[d] * m[:, d]
        e6 = np.floor(acc * 1000000.0).astype(np.int64)
        return pa.table({
            "vec_id": batch["vec_id"],
            "score_e6": pa.array(e6, pa.int64()),
            "kept": pa.array((e6 >= 0).astype(np.int64), pa.int64()),
        })


def quality_scores(sf_dir: str):
    import ray.data as rd

    ds = _rp(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"]).repartition(8)
    return ds.map_batches(QualityScoreStage, concurrency=(2, 16),
                          batch_format="pyarrow", batch_size=4096)

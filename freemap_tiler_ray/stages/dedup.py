"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup (training-data-pipeline layer).

Shapes follow the scalable patterns (ray_guide / SURVEY.md §7):
  - exact: content-hash in map_batches -> groupby(hash) keep-first
  - MinHash-LSH: shingle->minhash per batch (vectorized reduceat) ->
    explode (band_key, doc, shingle-set) -> groupby(band) -> candidate
    pairs verified by true Jaccard inside the group (the shingle sets
    ride along with the band rows: one shuffle, no second join)
  - SimHash: 32-bit signature; candidate pairs via 4x8-bit band buckets
    (pigeonhole: hamming <= 3 pairs must agree on >= 1 band), verified
    by exact hamming distance
  - embedding: normalized matrix broadcast once (ray.put), per-batch
    matmul against it (at 1e12 scale the broadcast side becomes the
    IVF/LSH bucket index from stages/ann.py; same batch contract)

Every variant's semantics are mirrored by a DuckDB oracle; thresholds
and hash constants are defined here and embedded into the SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .text import shingle_hashes

# MinHash parameters (mirrored in __ray_entry__ SQL)
MINHASH_PERMS = 16
MINHASH_MOD = 1 << 30
LSH_ROWS_PER_BAND = 2          # b = 8 bands of r = 2
JACCARD_TAU = 0.05
NGRAM_JACCARD_TAU = 0.01
SIMHASH_MAX_HAMMING = 1
EMBED_COS_TAU = 0.45
SHINGLE_K = 3


def minhash_params():
    """Deterministic (a_p, b_p) per permutation; products stay < 2^60
    so both numpy int64 and DuckDB BIGINT are overflow-safe."""
    from ..geo import _mix32

    p = np.arange(MINHASH_PERMS, dtype=np.int64)
    a = (2 * _mix32(p).astype(np.int64) + 1) % MINHASH_MOD
    b = _mix32(p + 997).astype(np.int64) % MINHASH_MOD
    return a, b


def doc_shingles(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, shingles list<int64>)."""
    df = batch.select(["doc_id", "text"]).to_pandas()
    hs = shingle_hashes(df["text"], SHINGLE_K)
    return pa.table({"doc_id": pa.array(df["doc_id"], pa.int64()),
                     "shingles": pa.array([h.tolist() for h in hs],
                                          pa.list_(pa.int64()))})


def minhash_signatures(batch: pa.Table) -> pa.Table:
    """(doc_id, shingles) -> exploded (doc_id, perm, minhash); vectorized
    via flattened reduceat across the batch."""
    a, b = minhash_params()
    sh = batch["shingles"]
    if isinstance(sh, pa.ChunkedArray):
        sh = sh.combine_chunks()
    offsets = sh.offsets.to_numpy()
    flat = sh.flatten().to_numpy() % MINHASH_MOD
    doc_ids = batch["doc_id"].to_numpy()
    n = len(doc_ids)
    sigs = np.empty((MINHASH_PERMS, n), np.int64)
    starts = offsets[:-1]
    for p in range(MINHASH_PERMS):
        vals = (a[p] * flat + b[p]) % MINHASH_MOD
        sigs[p] = np.minimum.reduceat(vals, starts)
    return pa.table({
        "doc_id": pa.array(np.tile(doc_ids, MINHASH_PERMS), pa.int64()),
        "perm": pa.array(np.repeat(np.arange(MINHASH_PERMS), n), pa.int64()),
        "minhash": pa.array(sigs.ravel(), pa.int64()),
    })


def _band_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, shingles) -> one row per (band_key, doc_id, shingles)."""
    a, b = minhash_params()
    sh = batch["shingles"]
    if isinstance(sh, pa.ChunkedArray):
        sh = sh.combine_chunks()
    offsets = sh.offsets.to_numpy()
    flat = sh.flatten().to_numpy() % MINHASH_MOD
    doc_ids = batch["doc_id"].to_numpy()
    n = len(doc_ids)
    sigs = np.empty((MINHASH_PERMS, n), np.int64)
    for p in range(MINHASH_PERMS):
        vals = (a[p] * flat + b[p]) % MINHASH_MOD
        sigs[p] = np.minimum.reduceat(vals, offsets[:-1])
    n_bands = MINHASH_PERMS // LSH_ROWS_PER_BAND
    keys, docs, lists = [], [], []
    sh_py = sh.to_pylist()
    for bi in range(n_bands):
        rows = sigs[bi * LSH_ROWS_PER_BAND:(bi + 1) * LSH_ROWS_PER_BAND]
        for i in range(n):
            keys.append(f"{bi}:" + "-".join(str(int(v)) for v in rows[:, i]))
            docs.append(int(doc_ids[i]))
            lists.append(sh_py[i])
    return pa.table({"band_key": pa.array(keys, pa.string()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "shingles": pa.array(lists, pa.list_(pa.int64()))})


def _pairs_in_band(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values("doc_id").drop_duplicates("doc_id")
    ids = g["doc_id"].to_numpy()
    sets = [np.asarray(s, np.int64) for s in g["shingles"]]
    out_a, out_b, out_j = [], [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = np.intersect1d(sets[i], sets[j],
                                   assume_unique=True).size
            union = sets[i].size + sets[j].size - inter
            jac = np.float64(inter) / np.float64(union)
            if jac >= JACCARD_TAU:
                out_a.append(int(ids[i])); out_b.append(int(ids[j]))
                out_j.append(float(jac))
    return pd.DataFrame({"doc_a": pd.array(out_a, "int64"),
                         "doc_b": pd.array(out_b, "int64"),
                         "jaccard": pd.array(out_j, "float64")})


def _keep_multi_keys(ds, key: str):
    """Drop rows whose key value occurs only once: a cheap key-column-only
    count pass, then a broadcast isin filter. (Collision keys are a tiny
    fraction of all keys, so the driver-side collect of multi-keys stays
    small even at large doc counts; at extreme scale swap the collect for
    a Bloom filter.) Most buckets are singletons and can never produce a
    pair, so this cuts the heavy-shuffle row count drastically."""
    import ray
    from ray.data.aggregate import Count

    counts = (ds.select_columns([key]).groupby(key)
                .aggregate(Count(alias_name="n")).to_pandas())
    multi = counts.loc[counts["n"] > 1, key].to_numpy()
    ref = ray.put(multi)

    def flt(batch: pa.Table) -> pa.Table:
        keep = np.isin(np.asarray(batch[key].to_pandas()), ray.get(ref))
        return batch.filter(pa.array(keep))

    return ds.map_batches(flt, batch_format="pyarrow")


def lsh_candidate_pairs(shingled_ds):
    """MinHash-LSH near-dup pairs: band explode -> groupby(band_key) ->
    in-group verified pairs -> distinct over bands."""
    from ray.data.aggregate import Max

    bands = shingled_ds.map_batches(_band_rows, batch_format="pyarrow")
    bands = _keep_multi_keys(bands, "band_key")
    pairs = bands.groupby("band_key").map_groups(_pairs_in_band,
                                                 batch_format="pandas")
    return (pairs.groupby(["doc_a", "doc_b"])
                 .aggregate(Max("jaccard", alias_name="jaccard")))


def simhash_signature(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> 32-bit simhash over token hashes (weight +-1 per
    bit), vectorized with reduceat."""
    import hashlib

    df = batch.select(["doc_id", "text"]).to_pandas()
    tok_lists = df["text"].str.split(" ")
    counts = tok_lists.str.len().to_numpy()
    offsets = np.zeros(len(counts) + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    flat_tokens = [t for lst in tok_lists for t in lst]
    th = np.array([int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                   for t in flat_tokens], np.int64) % (1 << 32)
    bits = ((th[:, None] >> np.arange(32)[None, :]) & 1) * 2 - 1  # (N, 32)
    sums = np.add.reduceat(bits, offsets[:-1], axis=0)
    sig = ((sums > 0).astype(np.int64) << np.arange(32)[None, :]).sum(axis=1)
    return pa.table({"doc_id": pa.array(df["doc_id"], pa.int64()),
                     "simhash": pa.array(sig, pa.int64())})


def simhash_pairs(sig_ds):
    """Pairs with hamming(simhash) <= SIMHASH_MAX_HAMMING via 4x8-bit
    band buckets (exact by pigeonhole: <= 3 flipped bits cannot touch
    all 4 bands; we use an even tighter threshold)."""

    def bands(batch: pa.Table) -> pa.Table:
        sig = batch["simhash"].to_numpy()
        ids = batch["doc_id"].to_numpy()
        keys, docs, sigs = [], [], []
        for bi in range(4):
            part = (sig >> (8 * bi)) & 0xFF
            for i in range(len(ids)):
                keys.append(f"{bi}:{int(part[i])}")
                docs.append(int(ids[i]))
                sigs.append(int(sig[i]))
        return pa.table({"band_key": pa.array(keys, pa.string()),
                         "doc_id": pa.array(docs, pa.int64()),
                         "simhash": pa.array(sigs, pa.int64())})

    def _popcount64(v: np.ndarray) -> np.ndarray:
        v = v.astype(np.uint64)
        v = v - ((v >> np.uint64(1)) & np.uint64(0x5555555555555555))
        v = ((v & np.uint64(0x3333333333333333))
             + ((v >> np.uint64(2)) & np.uint64(0x3333333333333333)))
        v = (v + (v >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        return ((v * np.uint64(0x0101010101010101))
                >> np.uint64(56)).astype(np.int64)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").drop_duplicates("doc_id")
        ids = g["doc_id"].to_numpy()
        sig = g["simhash"].to_numpy()
        ham = _popcount64(sig[:, None] ^ sig[None, :])
        ii, jj = np.where((ham <= SIMHASH_MAX_HAMMING)
                          & (ids[:, None] < ids[None, :]))
        return pd.DataFrame({"doc_a": pd.array(ids[ii], "int64"),
                             "doc_b": pd.array(ids[jj], "int64"),
                             "hamming": pd.array(ham[ii, jj], "int64")})

    from ray.data.aggregate import Min

    b = sig_ds.map_batches(bands, batch_format="pyarrow")
    p = b.groupby("band_key").map_groups(pairs, batch_format="pandas")
    return (p.groupby(["doc_a", "doc_b"])
             .aggregate(Min("hamming", alias_name="hamming")))


def ngram_pairs(shingled_ds):
    """n-gram Jaccard pairs: explode (shingle, doc) -> groupby(shingle)
    candidate pairs -> distinct -> verify Jaccard >= NGRAM_JACCARD_TAU.
    Shingle sets ride along (same one-shuffle shape as LSH)."""

    def explode(batch: pa.Table) -> pa.Table:
        sh = batch["shingles"]
        if isinstance(sh, pa.ChunkedArray):
            sh = sh.combine_chunks()
        offsets = sh.offsets.to_numpy()
        flat = sh.flatten().to_numpy()
        ids = np.repeat(batch["doc_id"].to_numpy(),
                        offsets[1:] - offsets[:-1])
        lists = np.repeat(np.arange(len(offsets) - 1),
                          offsets[1:] - offsets[:-1])
        sh_py = sh.to_pylist()
        return pa.table({"shingle": pa.array(flat, pa.int64()),
                         "doc_id": pa.array(ids, pa.int64()),
                         "shingles": pa.array([sh_py[i] for i in lists],
                                              pa.list_(pa.int64()))})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").drop_duplicates("doc_id")
        ids = g["doc_id"].to_numpy()
        sets = [np.asarray(s, np.int64) for s in g["shingles"]]
        a, b, js = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = np.intersect1d(sets[i], sets[j], assume_unique=True).size
                union = sets[i].size + sets[j].size - inter
                jac = np.float64(inter) / np.float64(union)
                if jac >= NGRAM_JACCARD_TAU:
                    a.append(int(ids[i])); b.append(int(ids[j]))
                    js.append(float(jac))
        return pd.DataFrame({"doc_a": pd.array(a, "int64"),
                             "doc_b": pd.array(b, "int64"),
                             "jaccard": pd.array(js, "float64")})

    from ray.data.aggregate import Max

    ex = shingled_ds.map_batches(explode, batch_format="pyarrow")
    ex = _keep_multi_keys(ex, "shingle")
    p = ex.groupby("shingle").map_groups(pairs, batch_format="pandas")
    return (p.groupby(["doc_a", "doc_b"])
             .aggregate(Max("jaccard", alias_name="jaccard")))


def embedding_pairs(emb_ds, tau: float = EMBED_COS_TAU):
    """Embedding-cosine near-dup pairs (vec_a < vec_b, cos >= tau).
    The normalized matrix is broadcast once; each batch does one matmul
    against it. (At 1e12 scale, replace the broadcast with the ANN
    bucket index — stages/ann.py — same per-batch contract.)"""
    import ray

    all_df = emb_ds.to_pandas()
    ids = all_df["vec_id"].to_numpy()
    mat = np.stack([np.asarray(v, np.float64) for v in all_df["embedding"]])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ref = ray.put((ids, mat))

    def batch_pairs(batch: pa.Table) -> pa.Table:
        bids = batch["vec_id"].to_numpy()
        bm = np.stack([np.asarray(v, np.float64)
                       for v in batch["embedding"].to_pylist()])
        bm = bm / np.linalg.norm(bm, axis=1, keepdims=True)
        aids, amat = ray.get(ref)
        cos = bm @ amat.T
        ii, jj = np.where((cos >= tau) & (bids[:, None] < aids[None, :]))
        return pa.table({"vec_a": pa.array(bids[ii], pa.int64()),
                         "vec_b": pa.array(aids[jj], pa.int64())})

    return emb_ds.map_batches(batch_pairs, batch_format="pyarrow")

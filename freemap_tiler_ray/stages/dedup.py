"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup (training-data-pipeline layer).

Shapes follow the scalable patterns (ray_guide / SURVEY.md §7):
  - exact: content-hash in map_batches -> groupby(hash) keep-first
  - MinHash-LSH: shingle->minhash per batch (vectorized reduceat) ->
    explode integer-packed (band_key, doc_id) rows ONLY (16 bytes/row,
    no shingle sets through the shuffle) -> Bloom singleton prefilter
    -> groupby(band) candidate pairs -> hash-join the candidates back
    to their shingle sets -> vectorized exact-Jaccard verify
  - SimHash: 60-bit signature; candidate pairs via 4x15-bit band
    buckets (pigeonhole: hamming <= 3 pairs must agree on >= 1 band;
    32768 buckets per band keeps in-bucket pair work O(N^2/32768))
  - embedding: exact distributed triangle self-join over hash buckets
    (every unordered pair meets in exactly one groupby group)

Every variant's semantics are mirrored by a DuckDB oracle; thresholds
and hash constants are defined here and embedded into the SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..tuning import JOIN_PARTS as _JOIN_PARTS
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
    """(doc_id, shingles) -> one row per (band_key, doc_id). The band
    key packs (band, sig0, sig1) into one int64 ((3+30+30 bits), no
    per-row strings) and the shingle sets do NOT ride along: the shuffle
    carries 16 bytes per band row instead of the whole set x8 bands."""
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
    bi = np.arange(n_bands, dtype=np.int64)
    keys = ((bi[:, None] << 60) | (sigs[0::2] << 30) | sigs[1::2]).ravel()
    return pa.table({"band_key": pa.array(keys, pa.int64()),
                     "doc_id": pa.array(np.tile(doc_ids, n_bands),
                                        pa.int64())})


N_PAIR_PARTS = 64


def _pairs_by_key(ds, key: str, n_parts: int = N_PAIR_PARTS):
    """Candidate pairs within each `key` bucket, executed as ONE
    map_groups call per HASH PARTITION rather than per bucket. Ray's
    per-group pandas dispatch costs milliseconds per group, which
    dominates when buckets are tiny (the common case after the Bloom
    prefilter: most buckets hold 2-25 docs); grouping by a hash
    partition of the key keeps the same co-location guarantee (every
    bucket lands whole in exactly one partition) while amortizing the
    dispatch over thousands of buckets. Inside, a sorted boundary scan
    emits each bucket's triangle with numpy only. n_parts bounds
    per-task memory to ~rows/n_parts; scale it with the cluster."""

    def part(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy().astype(np.uint64)
        h = (k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        return batch.append_column(
            "_part", pa.array((h % np.uint64(n_parts)).astype(np.int64)))

    def pairs(g: pd.DataFrame) -> pa.Table:
        k = g[key].to_numpy()
        d = g["doc_id"].to_numpy()
        order = np.lexsort((d, k))
        k, d = k[order], d[order]
        keep = np.ones(len(k), bool)
        keep[1:] = (k[1:] != k[:-1]) | (d[1:] != d[:-1])
        k, d = k[keep], d[keep]
        bounds = np.flatnonzero(np.r_[True, k[1:] != k[:-1], True])
        out_a, out_b = [], []
        for s, t in zip(bounds[:-1], bounds[1:]):
            if t - s < 2:
                continue
            ii, jj = np.triu_indices(t - s, k=1)
            out_a.append(d[s:t][ii])
            out_b.append(d[s:t][jj])
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        return pa.table({"doc_a": pa.array(np.asarray(a, np.int64)),
                             "doc_b": pa.array(np.asarray(b, np.int64))})

    return (ds.map_batches(part, batch_format="pyarrow")
            .groupby("_part").map_groups(pairs, batch_format="pandas"))


def _pair_dedup(a: np.ndarray, b: np.ndarray):
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    keep = np.ones(len(a), bool)
    keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    return a[keep], b[keep]


def _distinct_pairs(pairs_ds, n_parts: int = 64):
    """DISTINCT (doc_a, doc_b) as combiner + hash-partitioned dedup.
    A groupby([doc_a, doc_b]).aggregate here creates one group PER
    PAIR — millions of tiny groups whose per-group dispatch dominates;
    instead dedup locally (vectorized lexsort scan), shuffle by a hash
    of the pair, and dedup each partition in one call."""

    def local(t: pa.Table) -> pa.Table:
        a, b = _pair_dedup(t["doc_a"].to_numpy(), t["doc_b"].to_numpy())
        h = ((a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
             ^ (b.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)))
        return pa.table({
            "doc_a": pa.array(a, pa.int64()),
            "doc_b": pa.array(b, pa.int64()),
            "_part": pa.array(((h >> np.uint64(17))
                               % np.uint64(n_parts)).astype(np.int64))})

    def part_dedup(g: pd.DataFrame) -> pa.Table:
        a, b = _pair_dedup(g["doc_a"].to_numpy(), g["doc_b"].to_numpy())
        return pa.table({"doc_a": pa.array(np.asarray(a, np.int64)),
                             "doc_b": pa.array(np.asarray(b, np.int64))})

    return (pairs_ds.map_batches(local, batch_format="pyarrow")
            .groupby("_part").map_groups(part_dedup, batch_format="pandas"))


def _verify_jaccard(pairs_ds, shingled_ds, tau: float,
                    docs_ds=None, shingle_fn=None):
    """Hash-join candidate pairs back to their shingle sets (sets ship
    only for candidate docs, not on every band row) and verify exact
    Jaccard. The per-row set intersection runs only over candidates —
    a tiny fraction of N — so the Python loop is off the hot path.

    When (docs_ds, shingle_fn) are given, the join side is built by
    Bloom-filtering the RAW docs down to candidate ids BEFORE
    shingling, so corpus-scale shingle work runs once (in the caller's
    band branch) instead of once per join branch; the candidate-only
    side is then materialized (bounded by the candidate count) so the
    a/b branches and the joins never recompute it. A Bloom false
    positive only ships one extra doc's set into an inner join that
    drops it."""
    import ray

    # candidates are the SMALL output of the band phase — materialize
    # once so the bloom build and the join don't re-run that phase
    pairs_ds = pairs_ds.materialize()

    if docs_ds is not None:
        words = BLOOM_BITS // 64

        def pair_ids_bloom(t: pa.Table) -> pa.Table:
            bm = np.zeros(words, np.uint64)
            k = np.unique(np.concatenate([t["doc_a"].to_numpy(),
                                          t["doc_b"].to_numpy()]))
            for h in _bloom_hashes(k, BLOOM_BITS):
                np.bitwise_or.at(bm, (h >> np.uint64(6)).astype(np.int64),
                                 np.uint64(1) << (h & np.uint64(63)))
            return pa.table({"bloom": pa.array([bm.tobytes()], pa.binary())})

        bm = np.zeros(words, np.uint64)
        for row in (pairs_ds.select_columns(["doc_a", "doc_b"])
                    .map_batches(pair_ids_bloom, batch_format="pyarrow",
                                 batch_size=None).take_all()):
            bm |= np.frombuffer(row["bloom"], np.uint64)
        ref = ray.put(bm)

        def keep_candidates(batch: pa.Table) -> pa.Table:
            b = ray.get(ref)
            h1, h2 = _bloom_hashes(batch["doc_id"].to_numpy(), BLOOM_BITS)
            one, six, mask = np.uint64(1), np.uint64(6), np.uint64(63)
            hit = ((((b[(h1 >> six).astype(np.int64)] >> (h1 & mask)) & one)
                    != 0)
                   & (((b[(h2 >> six).astype(np.int64)] >> (h2 & mask))
                       & one) != 0))
            return batch.filter(pa.array(hit))

        shingled_ds = (docs_ds
                       .map_batches(keep_candidates, batch_format="pyarrow")
                       .map_batches(shingle_fn, batch_format="pyarrow")
                       .materialize())

    def _ren(suffix):
        # the set rides as a binary blob: Acero hash joins reject
        # list-typed payload columns, and bytes shuffle just as well
        def ren(t: pa.Table) -> pa.Table:
            sh = t["shingles"]
            if isinstance(sh, pa.ChunkedArray):
                sh = sh.combine_chunks()
            off = sh.offsets.to_numpy() * 8
            buf = sh.flatten().to_numpy().astype(np.int64).tobytes()
            blobs = [buf[off[i]:off[i + 1]] for i in range(len(sh))]
            return pa.table({f"rid_{suffix}": t["doc_id"],
                             f"sh_{suffix}": pa.array(blobs, pa.binary())})
        return ren

    sa = shingled_ds.map_batches(_ren("a"), batch_format="pyarrow")
    sb = shingled_ds.map_batches(_ren("b"), batch_format="pyarrow")
    j = (pairs_ds
         .join(sa, join_type="inner", num_partitions=_JOIN_PARTS,
               on=("doc_a",), right_on=("rid_a",))
         .join(sb, join_type="inner", num_partitions=_JOIN_PARTS,
               on=("doc_b",), right_on=("rid_b",)))

    def _flat64(col):
        """Binary column of int64-blob sets -> (zero-copy int64 view of
        the Arrow data buffer, per-row element offsets). Rows of a
        binary array are stored concatenated with monotone offsets, so
        row i's set is vals[off[i]:off[i+1]] — NO gather, NO fresh
        allocation (this sandbox first-touches new pages at ~25 MB/s,
        so a flat copy here measured 3x slower end-to-end)."""
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        n = len(arr)
        boff = np.frombuffer(arr.buffers()[1], np.int32)[
            arr.offset:arr.offset + n + 1].astype(np.int64)
        vals = np.frombuffer(arr.buffers()[2], np.int64)
        return vals, boff // 8

    def verify(t: pa.Table) -> pa.Table:
        # per-pair set intersection over ZERO-COPY buffer slices
        # (round-4 rebuild: the original loop paid ~190 us/pair in
        # to_pylist() bytes-object + frombuffer overhead — the 40x
        # dedup-scaling run measured lsh_pairs 113.7 -> 93.3 s from 4
        # to 16 CPUs with ~3.9M candidate pairs stuck behind it; the
        # intersect1d kernel itself is ~5 us/pair, and a batch-wide
        # lexsort alternative measured WORSE — ~2M elem/s on random
        # int64 — so the loop stays, fed by flat-buffer slices).
        if not t.num_rows:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        va, offa = _flat64(t["sh_a"])
        vb, offb = _flat64(t["sh_b"])
        n = t.num_rows
        jac = np.empty(n, np.float64)
        isect = np.intersect1d
        for i in range(n):
            x = va[offa[i]:offa[i + 1]]
            y = vb[offb[i]:offb[i + 1]]
            inter = isect(x, y, assume_unique=True).size
            jac[i] = inter / (x.size + y.size - inter)
        keep = jac >= tau
        return pa.table({
            "doc_a": pa.array(t["doc_a"].to_numpy()[keep], pa.int64()),
            "doc_b": pa.array(t["doc_b"].to_numpy()[keep], pa.int64()),
            "jaccard": pa.array(jac[keep], pa.float64())})

    return j.map_batches(verify, batch_format="pyarrow")


BLOOM_BITS = 1 << 23        # 1 MiB bitmap, fixed regardless of key count


def _bloom_hashes(k: np.ndarray, bits: int):
    k = k.astype(np.uint64)
    h1 = k * np.uint64(0x9E3779B97F4A7C15)
    h1 = h1 ^ (h1 >> np.uint64(29))
    h2 = (k * np.uint64(0xC2B2AE3D27D4EB4F)) ^ (k >> np.uint64(33))
    return h1 % np.uint64(bits), h2 % np.uint64(bits)


def _keep_multi_keys(ds, key: str, bloom_bits: int = BLOOM_BITS):
    """Drop rows whose integer key occurs only once — singleton buckets
    can never produce a pair, so this cuts the heavy-shuffle row count
    drastically. The multi-occurrence key set is summarized as a pair
    of fixed-size Bloom bitmaps (seen, dup) built in ONE streaming
    map_batches pass — no groupby/shuffle of the band rows themselves:

        merge((s1, d1), (s2, d2)) = (s1|s2, d1|d2|(s1 & s2))

    is an associative monoid, so per-block bitmaps tree-merge through a
    32-way repartition and a tiny driver fold. Exactness: a key present
    in two blocks sets BOTH its bit positions in each block's `seen`,
    so `s_i & s_j` flags it in `dup`; a Bloom false positive only lets
    a singleton row through to a size-1 group that emits no pairs."""
    import ray

    words = bloom_bits // 64

    def block_bitmaps(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy()
        seen = np.zeros(words, np.uint64)
        dup = np.zeros(words, np.uint64)
        uniq, counts = np.unique(k, return_counts=True)
        h1, h2 = _bloom_hashes(uniq, bloom_bits)
        one = np.uint64(1)
        six = np.uint64(6)
        mask = np.uint64(63)
        for h in (h1, h2):
            np.bitwise_or.at(seen, (h >> six).astype(np.int64),
                             one << (h & mask))
        multi = counts > 1
        for h in (h1[multi], h2[multi]):
            np.bitwise_or.at(dup, (h >> six).astype(np.int64),
                             one << (h & mask))
        return pa.table({"seen": pa.array([seen.tobytes()], pa.binary()),
                         "dup": pa.array([dup.tobytes()], pa.binary())})

    def merge_bitmaps(t: pa.Table) -> pa.Table:
        seen = np.zeros(words, np.uint64)
        dup = np.zeros(words, np.uint64)
        for s_buf, d_buf in zip(t["seen"].to_pylist(), t["dup"].to_pylist()):
            s = np.frombuffer(s_buf, np.uint64)
            dup |= np.frombuffer(d_buf, np.uint64) | (seen & s)
            seen |= s
        return pa.table({"seen": pa.array([seen.tobytes()], pa.binary()),
                         "dup": pa.array([dup.tobytes()], pa.binary())})

    parts = (ds.select_columns([key])
             .map_batches(block_bitmaps, batch_format="pyarrow",
                          batch_size=None)
             .repartition(32)
             .map_batches(merge_bitmaps, batch_format="pyarrow",
                          batch_size=None))
    seen = np.zeros(words, np.uint64)
    bm = np.zeros(words, np.uint64)
    for row in parts.take_all():
        s = np.frombuffer(row["seen"], np.uint64)
        bm |= np.frombuffer(row["dup"], np.uint64) | (seen & s)
        seen |= s
    ref = ray.put(bm)

    def flt(batch: pa.Table) -> pa.Table:
        b = ray.get(ref)
        h1, h2 = _bloom_hashes(batch[key].to_numpy(), bloom_bits)
        one = np.uint64(1)
        six = np.uint64(6)
        mask = np.uint64(63)
        keep = ((((b[(h1 >> six).astype(np.int64)] >> (h1 & mask)) & one)
                 != 0)
                & (((b[(h2 >> six).astype(np.int64)] >> (h2 & mask)) & one)
                   != 0))
        return batch.filter(pa.array(keep))

    return ds.map_batches(flt, batch_format="pyarrow")


def lsh_candidate_pairs(shingled_ds, docs_ds=None, shingle_fn=None):
    """MinHash-LSH near-dup pairs, two-phase: integer band rows ->
    Bloom singleton prefilter -> groupby(band_key) candidate pairs ->
    distinct -> join shingle sets back -> exact-Jaccard verify."""
    # materialize the band rows: the Bloom prefilter's driver fold and
    # the pair pass both consume them, and without a checkpoint each
    # execution would re-run shingle+minhash over the full corpus.
    # Band rows are 16 bytes x n_bands per doc — far smaller than the
    # text they summarize — so the object-store footprint is bounded
    # and spillable at any corpus size.
    bands = (shingled_ds.map_batches(_band_rows, batch_format="pyarrow")
             .materialize())
    bands = _keep_multi_keys(bands, "band_key")
    cands = _distinct_pairs(_pairs_by_key(bands, "band_key"))
    return _verify_jaccard(cands, shingled_ds, JACCARD_TAU,
                           docs_ds=docs_ds, shingle_fn=shingle_fn)


SIMHASH_BITS = 60            # 4 hex-truncated md5 nibbles short of 64:
SIMHASH_BAND_BITS = 15       # stays positive in int64/BIGINT; 4 bands
                             # of 15 bits -> 32768 buckets per band


def simhash_signature(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> 60-bit simhash over token hashes (weight +-1
    per bit), vectorized with reduceat. Token md5 runs once per UNIQUE
    token in the batch (Zipf: the vocabulary is far smaller than the
    token stream), mirrored by DuckDB ('0x'||substr(md5(tk),1,15))."""
    import hashlib

    import pyarrow.compute as pc

    df = batch.select(["doc_id", "text"]).to_pandas()
    # Arrow split/flatten + hash-based dictionary factorization (~10x
    # sort-based np.unique on object strings; order-independent here —
    # uh[inv] maps code -> hash regardless of dictionary order)
    splits = pc.split_pattern(pa.array(df["text"], pa.string()), " ")
    counts = pc.list_value_length(splits).to_numpy().astype(np.int64)
    offsets = np.zeros(len(counts) + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    dd = pc.dictionary_encode(pc.list_flatten(splits))
    inv = dd.indices.to_numpy().astype(np.int64)
    uniq = dd.dictionary.to_pylist()
    uh = np.fromiter(
        (int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big") >> 4
         for t in uniq), np.int64, count=len(uniq))
    th = uh[inv]
    nb = SIMHASH_BITS
    bits = ((th[:, None] >> np.arange(nb)[None, :]) & 1) * 2 - 1  # (N, nb)
    sums = np.add.reduceat(bits, offsets[:-1], axis=0)
    sig = ((sums > 0).astype(np.int64) << np.arange(nb)[None, :]).sum(axis=1)
    return pa.table({"doc_id": pa.array(df["doc_id"], pa.int64()),
                     "simhash": pa.array(sig, pa.int64())})


def simhash_pairs(sig_ds):
    """Pairs with hamming(simhash) <= SIMHASH_MAX_HAMMING via 4x15-bit
    band buckets (exact by pigeonhole: <= 3 flipped bits cannot touch
    all 4 bands; we use an even tighter threshold). Band keys are
    integer-packed (band << 15 | part); the Bloom singleton prefilter
    drops the dominant no-pair buckets before the shuffle."""

    def bands(batch: pa.Table) -> pa.Table:
        sig = batch["simhash"].to_numpy()
        ids = batch["doc_id"].to_numpy()
        nb = SIMHASH_BITS // SIMHASH_BAND_BITS
        bi = np.arange(nb, dtype=np.int64)
        part = ((sig[None, :] >> (SIMHASH_BAND_BITS * bi[:, None]))
                & ((1 << SIMHASH_BAND_BITS) - 1))
        keys = ((bi[:, None] << SIMHASH_BAND_BITS) | part).ravel()
        return pa.table({"band_key": pa.array(keys, pa.int64()),
                         "doc_id": pa.array(np.tile(ids, nb), pa.int64()),
                         "simhash": pa.array(np.tile(sig, nb), pa.int64())})

    def _popcount64(v: np.ndarray) -> np.ndarray:
        v = v.astype(np.uint64)
        v = v - ((v >> np.uint64(1)) & np.uint64(0x5555555555555555))
        v = ((v & np.uint64(0x3333333333333333))
             + ((v >> np.uint64(2)) & np.uint64(0x3333333333333333)))
        v = (v + (v >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        return ((v * np.uint64(0x0101010101010101))
                >> np.uint64(56)).astype(np.int64)

    def part(batch: pa.Table) -> pa.Table:
        k = batch["band_key"].to_numpy().astype(np.uint64)
        h = (k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        return batch.append_column(
            "_part",
            pa.array((h % np.uint64(N_PAIR_PARTS)).astype(np.int64)))

    def pairs(g: pd.DataFrame) -> pa.Table:
        # one call per hash partition (see _pairs_by_key): a sorted
        # boundary scan walks every band bucket in the partition
        k = g["band_key"].to_numpy()
        d = g["doc_id"].to_numpy()
        s = g["simhash"].to_numpy()
        order = np.lexsort((d, k))
        k, d, s = k[order], d[order], s[order]
        keep = np.ones(len(k), bool)
        keep[1:] = (k[1:] != k[:-1]) | (d[1:] != d[:-1])
        k, d, s = k[keep], d[keep], s[keep]
        bounds = np.flatnonzero(np.r_[True, k[1:] != k[:-1], True])
        out_a, out_b, out_h = [], [], []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            if hi - lo < 2:
                continue
            ids, sig = d[lo:hi], s[lo:hi]
            ham = _popcount64(sig[:, None] ^ sig[None, :])
            ii, jj = np.where((ham <= SIMHASH_MAX_HAMMING)
                              & (ids[:, None] < ids[None, :]))
            out_a.append(ids[ii])
            out_b.append(ids[jj])
            out_h.append(ham[ii, jj])
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        h = np.concatenate(out_h) if out_h else np.empty(0, np.int64)
        return pa.table({"doc_a": pa.array(np.asarray(a, np.int64)),
                             "doc_b": pa.array(np.asarray(b, np.int64)),
                             "hamming": pa.array(np.asarray(h, np.int64))})

    def local_min(t: pa.Table) -> pa.Table:
        # per-pair min(hamming), vectorized, as combiner + partition
        # passes (a per-pair groupby.aggregate would make one group per
        # pair — see _distinct_pairs)
        a = t["doc_a"].to_numpy()
        b = t["doc_b"].to_numpy()
        h = t["hamming"].to_numpy()
        order = np.lexsort((h, b, a))
        a, b, h = a[order], b[order], h[order]
        first = np.ones(len(a), bool)
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        a, b, h = a[first], b[first], h[first]
        pk = ((a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
              ^ (b.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)))
        return pa.table({
            "doc_a": pa.array(a, pa.int64()),
            "doc_b": pa.array(b, pa.int64()),
            "hamming": pa.array(h, pa.int64()),
            "_ppart": pa.array(((pk >> np.uint64(17))
                                % np.uint64(N_PAIR_PARTS))
                               .astype(np.int64))})

    def part_min(g: pd.DataFrame) -> pa.Table:
        a = g["doc_a"].to_numpy()
        b = g["doc_b"].to_numpy()
        h = g["hamming"].to_numpy()
        order = np.lexsort((h, b, a))
        a, b, h = a[order], b[order], h[order]
        first = np.ones(len(a), bool)
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return pa.table({"doc_a": pa.array(np.asarray(a[first], np.int64)),
                             "doc_b": pa.array(np.asarray(b[first], np.int64)),
                             "hamming": pa.array(np.asarray(h[first], np.int64))})

    # materialize once: the Bloom prefilter fold and the pair pass both
    # consume the band rows (24 bytes x 4 bands per doc — bounded), and
    # a lazy lineage would re-run simhash_signature per consumer
    b = sig_ds.map_batches(bands, batch_format="pyarrow").materialize()
    b = _keep_multi_keys(b, "band_key")
    p = (b.map_batches(part, batch_format="pyarrow")
         .groupby("_part").map_groups(pairs, batch_format="pandas"))
    return (p.map_batches(local_min, batch_format="pyarrow")
            .groupby("_ppart").map_groups(part_min, batch_format="pandas"))


def _pair_intersections(shingled_ds, finish):
    """Shared count-based pair-intersection core (see ngram_pairs):
    explode (shingle, doc_id, sz) -> Bloom singleton prefilter ->
    per-bucket pair emission -> per-pair count sum -> `finish`
    (a map_groups callable over (doc_a, doc_b, sz_a, sz_b, n) partial
    rows grouped by pair-hash partition; it receives exact
    |A intersect B| per pair after its own reduceat fold)."""

    def explode(batch: pa.Table) -> pa.Table:
        sh = batch["shingles"]
        if isinstance(sh, pa.ChunkedArray):
            sh = sh.combine_chunks()
        offsets = sh.offsets.to_numpy()
        sizes = (offsets[1:] - offsets[:-1]).astype(np.int64)
        flat = sh.flatten().to_numpy()
        ids = np.repeat(batch["doc_id"].to_numpy(), sizes)
        return pa.table({"shingle": pa.array(flat, pa.int64()),
                         "doc_id": pa.array(ids, pa.int64()),
                         "sz": pa.array(np.repeat(sizes, sizes))})

    def part(t: pa.Table) -> pa.Table:
        k = t["shingle"].to_numpy().astype(np.uint64)
        h = (k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        return t.append_column(
            "_part",
            pa.array((h % np.uint64(N_PAIR_PARTS)).astype(np.int64)))

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        k = g["shingle"].to_numpy()
        d = g["doc_id"].to_numpy()
        sz = g["sz"].to_numpy()
        order = np.lexsort((d, k))
        k, d, sz = k[order], d[order], sz[order]
        # fully vectorized within-run triangle emission (one partition
        # holds millions of tiny shingle runs at corpus scale — a
        # per-run Python loop pays dispatch per DISTINCT shingle): the
        # element at local index i of a run of length c pairs, as the
        # 'a' side, with exactly the m = c - 1 - i elements after it,
        # so out_b is a contiguous index ramp per a-element.
        starts_all = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        c_run = np.diff(np.r_[starts_all, len(k)])
        run_of = np.repeat(np.arange(len(c_run)), c_run)
        local_i = np.arange(len(k), dtype=np.int64) - starts_all[run_of]
        m = c_run[run_of] - 1 - local_i
        ia = np.repeat(np.arange(len(k), dtype=np.int64), m)
        off = np.concatenate([[0], np.cumsum(m)])
        ib = ia + 1 + (np.arange(int(off[-1]), dtype=np.int64)
                       - np.repeat(off[:-1], m))
        return pa.table({"doc_a": pa.array(d[ia], pa.int64()),
                         "doc_b": pa.array(d[ib], pa.int64()),
                         "sz_a": pa.array(sz[ia], pa.int64()),
                         "sz_b": pa.array(sz[ib], pa.int64())})

    def local_count(t: pa.Table) -> pa.Table:
        # combiner: per-block partial co-occurrence count per pair
        a = t["doc_a"].to_numpy()
        b = t["doc_b"].to_numpy()
        sa = t["sz_a"].to_numpy()
        sb = t["sz_b"].to_numpy()
        order = np.lexsort((b, a))
        a, b, sa, sb = a[order], b[order], sa[order], sb[order]
        first = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        starts = np.flatnonzero(first)
        n = np.diff(np.r_[starts, len(a)])
        a, b, sa, sb = a[starts], b[starts], sa[starts], sb[starts]
        pk = ((a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
              ^ (b.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)))
        return pa.table({
            "doc_a": pa.array(a, pa.int64()),
            "doc_b": pa.array(b, pa.int64()),
            "sz_a": pa.array(sa, pa.int64()),
            "sz_b": pa.array(sb, pa.int64()),
            "n": pa.array(n.astype(np.int64)),
            "_ppart": pa.array(((pk >> np.uint64(17))
                                % np.uint64(N_PAIR_PARTS))
                               .astype(np.int64))})

    ex = shingled_ds.map_batches(explode, batch_format="pyarrow")
    ex = _keep_multi_keys(ex, "shingle")
    return (ex.map_batches(part, batch_format="pyarrow")
            .groupby("_part").map_groups(bucket_pairs,
                                         batch_format="pandas")
            .map_batches(local_count, batch_format="pyarrow")
            .groupby("_ppart").map_groups(finish,
                                          batch_format="pandas"))


def _fold_pair_counts(g: pd.DataFrame):
    """Fold per-block pair-count partials to one exact row per pair:
    (doc_a, doc_b, sz_a, sz_b, inter) numpy arrays."""
    a = g["doc_a"].to_numpy()
    b = g["doc_b"].to_numpy()
    sa = g["sz_a"].to_numpy()
    sb = g["sz_b"].to_numpy()
    n = g["n"].to_numpy()
    order = np.lexsort((b, a))
    a, b, sa, sb, n = (a[order], b[order], sa[order], sb[order],
                       n[order])
    first = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
    starts = np.flatnonzero(first)
    inter = np.add.reduceat(n, starts)
    return a[starts], b[starts], sa[starts], sb[starts], inter


def ngram_pairs(shingled_ds, docs_ds=None, shingle_fn=None):
    """n-gram Jaccard pairs, COUNT-based exact semantics: shingle sets
    are unique per doc, so the number of shingle buckets in which a
    pair co-occurs IS |A intersect B|; the union follows from per-doc
    set sizes carried on the exploded rows. No candidate set, no
    hash join shipping shingle sets (at tau this low most pairs are
    candidates, so the old join moved ~|pairs| * |set| bytes), no
    verify pass: explode (shingle, doc_id, sz) -> Bloom singleton
    prefilter -> per-bucket pair emission -> per-pair count sum ->
    jaccard = n / (sz_a + sz_b - n) >= NGRAM_JACCARD_TAU. (docs_ds /
    shingle_fn accepted for API compatibility; the count path never
    needs to reshingle.)"""
    tau = NGRAM_JACCARD_TAU

    def part_jaccard(g: pd.DataFrame) -> pa.Table:
        a, b, sa, sb, inter = _fold_pair_counts(g)
        jac = inter.astype(np.float64) / (sa + sb - inter).astype(
            np.float64)
        keep = jac >= tau
        return pa.table({"doc_a": pa.array(np.asarray(a[keep], np.int64)),
                         "doc_b": pa.array(np.asarray(b[keep], np.int64)),
                         "jaccard": pa.array(np.asarray(jac[keep],
                                                        np.float64))})

    return _pair_intersections(shingled_ds, part_jaccard)


CONT_TAU_PPM = 800_000   # containment threshold: floor(1e6*i/min) >= tau


def containment_pairs(shingled_ds):
    """Asymmetric containment dedup (detects SUBSET duplicates —
    truncations, quote-with-commentary, boilerplate-wrapped copies —
    that symmetric Jaccard misses): pairs where the smaller shingle
    set is >= CONT_TAU_PPM/1e6 contained in the larger,
    containment = |A intersect B| / min(|A|, |B|), reported as exact
    integer ppm. Shares the count-based pair-intersection core with
    ngram_pairs (same explode/prefilter/bucket/fold shuffles); only
    the finish differs, and the threshold compares i * 1e6 >=
    tau * min(szs) in integers so the filter is float-free."""

    def part_containment(g: pd.DataFrame) -> pa.Table:
        a, b, sa, sb, inter = _fold_pair_counts(g)
        mn = np.minimum(sa, sb)
        keep = inter * 1_000_000 >= CONT_TAU_PPM * mn
        a, b, sa, sb, inter, mn = (a[keep], b[keep], sa[keep], sb[keep],
                                   inter[keep], mn[keep])
        return pa.table({
            "doc_a": pa.array(np.asarray(a, np.int64)),
            "doc_b": pa.array(np.asarray(b, np.int64)),
            "n_common": pa.array(np.asarray(inter, np.int64)),
            "sz_a": pa.array(np.asarray(sa, np.int64)),
            "sz_b": pa.array(np.asarray(sb, np.int64)),
            "cont_ppm": pa.array(
                np.asarray(inter * 1_000_000 // mn, np.int64))})

    return _pair_intersections(shingled_ds, part_containment)


PPJOIN_TAU = 0.5                 # = PPJOIN_NUM / PPJOIN_DEN exactly
PPJOIN_NUM, PPJOIN_DEN = 1, 2    # rational tau for exact prefix lengths


def ppjoin_pairs(shingled_ds, docs_ds=None, shingle_fn=None):
    """Prefix-filtered set-similarity self-join (the PPJoin-family
    candidate strategy, Xiao et al. WWW'08 — public algorithm): for
    Jaccard >= tau, any qualifying pair must share a token inside each
    side's PREFIX of length |S| - ceil(tau*|S|) + 1 under one global
    token order (here: shingle hash ascending — shingle_hashes already
    emits per-doc sorted unique sets, so the prefix is a zero-copy
    head slice). Only prefix tokens reach the shuffle — a (1 - tau)
    fraction of each set, vs every token in ngram_pairs or whole band
    signatures in LSH — then candidates are verified with the shared
    exact-Jaccard rejoin (_verify_jaccard), so the prefix filter only
    affects candidate COUNT, never correctness. Prefix lengths use the
    rational tau (NUM/DEN) in integer arithmetic, so the filter's
    completeness guarantee is exact, not float-dependent."""

    def prefix_explode(batch: pa.Table) -> pa.Table:
        sh = batch["shingles"]
        if isinstance(sh, pa.ChunkedArray):
            sh = sh.combine_chunks()
        offsets = sh.offsets.to_numpy()
        sizes = (offsets[1:] - offsets[:-1]).astype(np.int64)
        flat = sh.flatten().to_numpy()
        # p = sz - ceil(tau * sz) + 1, exact via the rational tau
        p = sizes - (sizes * PPJOIN_NUM + PPJOIN_DEN - 1) // PPJOIN_DEN + 1
        starts = np.cumsum(sizes) - sizes
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, sizes)
        keep = pos < np.repeat(p, sizes)
        ids = np.repeat(batch["doc_id"].to_numpy(), sizes)
        return pa.table({"shingle": pa.array(flat[keep], pa.int64()),
                         "doc_id": pa.array(ids[keep], pa.int64())})

    ex = shingled_ds.map_batches(prefix_explode, batch_format="pyarrow")
    ex = _keep_multi_keys(ex, "shingle")      # singleton prefix tokens
    cands = _distinct_pairs(_pairs_by_key(ex, "shingle"))
    return _verify_jaccard(cands, shingled_ds, PPJOIN_TAU,
                           docs_ds=docs_ds, shingle_fn=shingle_fn)


WINNOW_MAXDF = 16        # IDF cutoff: fps in more docs are not evidence
WINNOW_MIN_SHARED = 3    # pairs must share >= this many fingerprints


def winnow_pairs(fp_ds, maxdf: int = WINNOW_MAXDF,
                 min_shared: int = WINNOW_MIN_SHARED):
    """Copy-detection pairs over winnowed rolling-hash fingerprints
    (doc pairs sharing >= min_shared fingerprints, counting only
    fingerprints whose doc frequency is <= maxdf — the IDF cutoff that
    bounds bucket size by a CONSTANT: a common-phrase fingerprint is
    not evidence of copying and would otherwise create an O(N^2)
    bucket). Input rows are the distinct (doc_id, fp) output of
    winnow_fingerprints. Exactly two shuffles, both by integer hash
    partition with vectorized partition bodies: hash(fp) applies the
    df filter and emits each bucket's pair triangle in one pass;
    hash(pair) sums per-block partial counts and applies the
    threshold."""

    def part(t: pa.Table) -> pa.Table:
        k = t["fp"].to_numpy().astype(np.uint64)
        h = (k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        return t.append_column(
            "_part",
            pa.array((h % np.uint64(N_PAIR_PARTS)).astype(np.int64)))

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        k = g["fp"].to_numpy()
        d = g["doc_id"].to_numpy()
        order = np.lexsort((d, k))
        k, d = k[order], d[order]
        bounds = np.flatnonzero(np.r_[True, k[1:] != k[:-1], True])
        sizes = bounds[1:] - bounds[:-1]
        out_a, out_b = [], []
        for s, n in zip(bounds[:-1], sizes):
            if n < 2 or n > maxdf:
                continue
            ii, jj = np.triu_indices(n, k=1)
            out_a.append(d[s:s + n][ii])
            out_b.append(d[s:s + n][jj])
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        return pa.table({"doc_a": pa.array(np.asarray(a, np.int64)),
                             "doc_b": pa.array(np.asarray(b, np.int64))})

    def local_count(t: pa.Table) -> pa.Table:
        # combiner: per-block partial count per pair
        a = t["doc_a"].to_numpy()
        b = t["doc_b"].to_numpy()
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        first = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        starts = np.flatnonzero(first)
        n = np.diff(np.r_[starts, len(a)])
        a, b = a[starts], b[starts]
        pk = ((a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
              ^ (b.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)))
        return pa.table({
            "doc_a": pa.array(a, pa.int64()),
            "doc_b": pa.array(b, pa.int64()),
            "n": pa.array(n.astype(np.int64)),
            "_ppart": pa.array(((pk >> np.uint64(17))
                                % np.uint64(N_PAIR_PARTS))
                               .astype(np.int64))})

    def part_count(g: pd.DataFrame) -> pa.Table:
        a = g["doc_a"].to_numpy()
        b = g["doc_b"].to_numpy()
        n = g["n"].to_numpy()
        order = np.lexsort((b, a))
        a, b, n = a[order], b[order], n[order]
        first = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        starts = np.flatnonzero(first)
        tot = np.add.reduceat(n, starts)
        keep = tot >= min_shared
        return pa.table({
            "doc_a": pa.array(np.asarray(a[starts][keep], np.int64)),
            "doc_b": pa.array(np.asarray(b[starts][keep], np.int64)),
            "n_shared": pa.array(np.asarray(tot[keep], np.int64))})

    return (fp_ds.map_batches(part, batch_format="pyarrow")
            .groupby("_part").map_groups(bucket_pairs,
                                         batch_format="pandas")
            .map_batches(local_count, batch_format="pyarrow")
            .groupby("_ppart").map_groups(part_count,
                                          batch_format="pandas"))


def connected_components(pairs_ds, docs_ds, max_iters: int = 16):
    """Near-dup cluster assignment: connected components over the dup
    pair graph by distributed min-label propagation — the step that
    turns pairwise dedup output into keep/drop decisions at corpus
    scale. Each iteration is one hash-join + grouped-min shuffle round
    (edges joined to current labels, every node takes the min of its
    own and its neighbors' labels); convergence in O(component
    diameter) rounds, detected by the monotone non-increasing sum of
    labels. Labels materialize between rounds (bounded: 16 bytes/doc)
    so iteration k does not re-execute rounds 0..k-1.

    Returns (doc_id, cluster) with cluster = min doc_id of the
    component; docs in no pair cluster to themselves."""
    from ray.data.aggregate import Sum

    def sym(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy()
        b = t["doc_b"].to_numpy()
        return pa.table({
            "e_src": pa.array(np.concatenate([a, b]), pa.int64()),
            "e_dst": pa.array(np.concatenate([b, a]), pa.int64())})

    def _doc_part(d: np.ndarray) -> np.ndarray:
        h = (d.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) \
            >> np.uint64(33)
        return (h % np.uint64(N_PAIR_PARTS)).astype(np.int64)

    def relab(t: pa.Table) -> pa.Table:
        d = t["e_dst"].to_numpy()
        return pa.table({"doc_id": pa.array(d, pa.int64()),
                         "cluster": t["cluster"].cast(pa.int64()),
                         "_part": pa.array(_doc_part(d))})

    def init(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy()
        return pa.table({"doc_id": pa.array(d, pa.int64()),
                         "cluster": pa.array(d, pa.int64()),
                         "_part": pa.array(_doc_part(d))})

    def part_min(g: pa.Table) -> pa.Table:
        # per-doc min label, one vectorized call per hash partition (a
        # per-doc groupby.aggregate pays per-group dispatch every
        # round); _part rides through so no re-hash pass per round;
        # arrow-in/arrow-out keeps union block types uniform
        d = g["doc_id"].to_numpy()
        c = g["cluster"].to_numpy()
        order = np.lexsort((c, d))
        d, c = d[order], c[order]
        first = np.r_[True, d[1:] != d[:-1]]
        return pa.table({"doc_id": pa.array(d[first], pa.int64()),
                         "cluster": pa.array(c[first], pa.int64()),
                         "_part": pa.array(_doc_part(d[first]))})

    edges = pairs_ds.map_batches(sym, batch_format="pyarrow").materialize()
    labels = docs_ds.map_batches(init, batch_format="pyarrow").materialize()
    prev = None
    for _ in range(max_iters):
        j = edges.join(labels, join_type="inner", num_partitions=_JOIN_PARTS,
                       on=("e_src",), right_on=("doc_id",))
        prop = j.map_batches(relab, batch_format="pyarrow")
        labels = (labels.union(prop)
                  .groupby("_part").map_groups(part_min,
                                               batch_format="pyarrow")
                  .materialize())
        cur = list(labels.aggregate(Sum("cluster")).values())[0]
        if cur == prev:
            break
        prev = cur
    return labels.select_columns(["doc_id", "cluster"])


def embedding_pairs(emb_ds, tau: float = EMBED_COS_TAU,
                    n_buckets: int = 8):
    """Embedding-cosine near-dup pairs (vec_a < vec_b, cos >= tau) as a
    distributed triangle self-join — exact semantics, no driver
    materialization, no full-matrix broadcast.

    Vectors are hash-bucketed by vec_id into B buckets; each row is
    replicated to the B bucket-pair groups it participates in (key =
    (min(b,t), max(b,t)) for t in 0..B-1), then one groupby(pair_key)
    computes the cross/within-bucket cosine pairs inside each group.
    Every unordered pair of vectors meets in exactly one group, so no
    post-dedup pass is needed. Shuffle volume is O(N*B) rows and each
    group holds ~2N/B vectors: per-task memory is bounded by the bucket
    size, and B scales as sqrt(2 * parallelism) on a real cluster."""

    B = n_buckets

    def replicate(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        n = len(ids)
        b = (ids % B).astype(np.int64)
        t = np.arange(B, dtype=np.int64)
        lo = np.minimum(b[:, None], t[None, :])
        hi = np.maximum(b[:, None], t[None, :])
        key = (lo * B + hi).ravel()
        idx = np.repeat(np.arange(n), B)
        out = batch.take(pa.array(idx))
        out = out.append_column("pair_key", pa.array(key, pa.int64()))
        return out.append_column("bucket", pa.array(b[idx], pa.int64()))

    def group_pairs(g: pa.Table) -> pa.Table:
        from .ann import _matrix

        key = g["pair_key"][0].as_py()
        lo, hi = divmod(key, B)
        ids = g["vec_id"].to_numpy()
        mat = _matrix(g["embedding"])     # zero-copy list_flatten
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        if lo == hi:
            cos = mat @ mat.T
            ii, jj = np.where((cos >= tau) & (ids[:, None] < ids[None, :]))
            a, bb = ids[ii], ids[jj]
        else:
            ma = g["bucket"].to_numpy() == lo
            cos = mat[ma] @ mat[~ma].T
            ii, jj = np.where(cos >= tau)
            ia, ib = ids[ma][ii], ids[~ma][jj]
            a, bb = np.minimum(ia, ib), np.maximum(ia, ib)
        order = np.lexsort((bb, a))
        return pa.table({"vec_a": pa.array(np.asarray(a[order], np.int64)),
                             "vec_b": pa.array(np.asarray(bb[order], np.int64))})

    return (emb_ds.map_batches(replicate, batch_format="pyarrow")
            .groupby("pair_key")
            .map_groups(group_pairs, batch_format="pyarrow"))

"""Mergeable sketches: KMV, HyperLogLog, CountMin, Misra-Gries.

Both are monoids: a per-batch ``map_batches`` partial produces a
fixed-size summary, one small ``groupby`` merges partials
associatively, so the shuffle ships sketch rows — never raw values.

KMV backs the oracle-checked ``kmv_distinct`` query: it orders md5 hex
digests (lexicographic order of the hex == numeric order of the 128-bit
value), keeps the k smallest per key, and estimates distinct counts as
``(k-1) / U(k)`` where ``U(k)`` is the k-th minimum mapped to (0, 1].
Every step is bit-deterministic and expressible in ANSI SQL
(``row_number() OVER (ORDER BY md5(x))``), so the DuckDB oracle matches
exactly — the rare sketch whose output CAN be value-hash-compared.

HLL is the production-scale alternative (2^p byte registers per key,
independent of k) with a tested error bound; it is not SQL-mirrorable
bit-for-bit, so it ships as a library stage with property tests instead
of an oracle query.
"""

from __future__ import annotations

import hashlib

import numpy as np

KMV_K = 64


def kmv_partial(hex_hashes: np.ndarray, k: int = KMV_K) -> np.ndarray:
    """k smallest DISTINCT md5 hex digests (ascending)."""
    u = np.unique(np.asarray(hex_hashes, dtype=object))
    return u[:k]


def kmv_merge(*partials: np.ndarray, k: int = KMV_K) -> np.ndarray:
    """Associative merge: k smallest of the union of partials."""
    return kmv_partial(np.concatenate([np.asarray(p, dtype=object)
                                       for p in partials]), k)


def kmv_estimate(sorted_unique_hex, k: int = KMV_K) -> float:
    """Distinct-count estimate from a merged KMV summary.

    If fewer than k distinct hashes exist the summary IS the distinct
    set (exact count); otherwise (k-1)/U(k) with U(k) the k-th minimum
    hash mapped to (0, 1] via its top 32 bits. Both branches are two
    IEEE-754 ops, mirrored verbatim by the SQL oracle."""
    n = len(sorted_unique_hex)
    if n < k:
        return float(n)
    v = int(str(sorted_unique_hex[k - 1])[:8], 16)
    return float(k - 1) / (v / 4294967296.0)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

HLL_P = 12                      # 2^12 = 4096 registers, ~1.6% rel. error
_HLL_M = 1 << HLL_P


def _hash64(values) -> np.ndarray:
    """64-bit hash per value (md5 top 8 bytes) — deterministic across
    processes (unlike Python's salted hash()). Hashed once per unique
    value; uniques are what a cardinality sketch consumes anyway."""
    arr = np.asarray(values, dtype=object)
    uniq, inv = np.unique(arr, return_inverse=True)
    h = np.fromiter(
        (int.from_bytes(hashlib.md5(str(s).encode("utf-8")).digest()[:8],
                        "big") for s in uniq),
        dtype=np.uint64, count=len(uniq))
    return h[inv]


def hll_partial(values, p: int = HLL_P) -> np.ndarray:
    """Register array (uint8[2^p]) for one batch of values."""
    m = 1 << p
    regs = np.zeros(m, np.uint8)
    if len(values) == 0:
        return regs
    h = _hash64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = (h << np.uint64(p)) | np.uint64(1 << (p - 1))  # sentinel caps rho
    # rho = 1 + number of leading zeros of the remaining 64-p bits
    lz = np.zeros(len(w), np.uint8)
    cur = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = cur < np.uint64(1 << (64 - shift))
        lz[mask] += shift
        cur[mask] <<= np.uint64(shift)
    np.maximum.at(regs, idx, lz + 1)
    return regs


def hll_merge(*partials: np.ndarray) -> np.ndarray:
    """Associative merge = elementwise max of registers."""
    out = partials[0].copy()
    for p_ in partials[1:]:
        np.maximum(out, p_, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range (linear counting)
    correction."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        return float(m * np.log(m / zeros))
    return float(est)


# ---------------------------------------------------------------------------
# Frequency sketches: CountMin + Misra-Gries heavy hitters
# ---------------------------------------------------------------------------

CM_DEPTH = 4
CM_WIDTH = 1 << 12              # eps ~ e/4096 ~ 0.07% of stream length

_CM_SEEDS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
             0x165667B19E3779F9, 0x27D4EB2F165667C5)


def _cm_rows(values, depth: int, width: int) -> np.ndarray:
    """(depth, n) counter indices — md5-derived, so deterministic across
    processes; one md5 per UNIQUE value, rows derived by seed-mixing."""
    arr = np.asarray(values, dtype=object)
    uniq, inv = np.unique(arr, return_inverse=True)
    h = np.fromiter(
        (int.from_bytes(hashlib.md5(str(s).encode("utf-8")).digest()[:8],
                        "big") for s in uniq),
        dtype=np.uint64, count=len(uniq))[inv]
    rows = np.empty((depth, len(h)), np.int64)
    for d in range(depth):
        m = (h ^ np.uint64(_CM_SEEDS[d])) * np.uint64(0x2545F4914F6CDD1D)
        rows[d] = ((m >> np.uint64(33)) % np.uint64(width)).astype(np.int64)
    return rows


def cm_partial(values, counts=None, depth: int = CM_DEPTH,
               width: int = CM_WIDTH) -> np.ndarray:
    """CountMin table (depth, width) int64 for one batch. `counts`
    weights each value (pre-aggregated (value, count) partials keep the
    per-batch md5 work to uniques)."""
    tab = np.zeros((depth, width), np.int64)
    values = np.asarray(values, dtype=object)
    if not len(values):
        return tab
    c = (np.ones(len(values), np.int64) if counts is None
         else np.asarray(counts, np.int64))
    rows = _cm_rows(values, depth, width)
    for d in range(depth):
        np.add.at(tab[d], rows[d], c)
    return tab


def cm_merge(*tabs: np.ndarray) -> np.ndarray:
    """Associative merge = elementwise sum (counters are linear)."""
    out = tabs[0].copy()
    for t in tabs[1:]:
        out += t
    return out


def cm_query(tab: np.ndarray, values) -> np.ndarray:
    """Point-frequency estimates: min over depth rows. Never
    underestimates; overestimates by <= e/width * N w.h.p."""
    depth, width = tab.shape
    rows = _cm_rows(np.asarray(values, dtype=object), depth, width)
    ests = np.stack([tab[d, rows[d]] for d in range(depth)])
    return ests.min(axis=0)


def mg_partial(values, counts=None, k: int = 64) -> dict:
    """Misra-Gries heavy-hitters summary (<= k-1 counters). After any
    merge order, counter error is <= N/k, so every item with true
    frequency > N/k survives in the summary."""
    from collections import Counter
    values = np.asarray(values, dtype=object)
    c = (np.ones(len(values), np.int64) if counts is None
         else np.asarray(counts, np.int64))
    exact = Counter()
    for v, n in zip(values, c):
        exact[v] += int(n)
    return _mg_trim(dict(exact), k)


def _mg_trim(d: dict, k: int) -> dict:
    if len(d) < k:
        return d
    # decrement all by the k-th largest count (the classic batched
    # Misra-Gries step), drop non-positive
    kth = sorted(d.values(), reverse=True)[k - 1]
    return {v: n - kth for v, n in d.items() if n > kth}


def mg_merge(*parts: dict, k: int = 64) -> dict:
    out: dict = {}
    for p in parts:
        for v, n in p.items():
            out[v] = out.get(v, 0) + n
    return _mg_trim(out, k)


# ---------------------------------------------------------------------------
# DD-style relative-error quantile sketch (log-binned histogram)
# ---------------------------------------------------------------------------
# The mergeable quantile path for 100 TB: each batch folds its values
# into geometrically-spaced bins (bin(x) = ceil(log_gamma(x)) with
# gamma = (1+alpha)/(1-alpha)); merge = sparse counter addition; a
# quantile estimate is the midpoint 2*gamma^i/(gamma+1) of the bin
# holding the target rank, which is within relative error alpha of the
# true value at that rank. Fixed memory: when a sketch exceeds
# max_bins, the lowest bins collapse into one (the paper's bound then
# degrades only below the collapsed prefix). Non-negative inputs; a
# dedicated zero counter handles exact zeros. Reference: Masson,
# Rim & Lee, "DDSketch: a fast and fully-mergeable quantile sketch
# with relative-error guarantees", VLDB 2019 (public).

DD_ALPHA = 0.01
DD_MAX_BINS = 2048


def _dd_gamma(alpha: float) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


def dd_partial(values, alpha: float = DD_ALPHA,
               max_bins: int = DD_MAX_BINS) -> dict:
    """Sketch one batch of non-negative values: {'zero': n0,
    'bins': {bin_index: count}} with geometric bins."""
    x = np.asarray(values, np.float64)
    if np.any(x < 0):
        raise ValueError("dd sketch expects non-negative values")
    n0 = int((x == 0).sum())
    pos = x[x > 0]
    out = {"zero": n0, "bins": {}}
    if len(pos):
        idx = np.ceil(np.log(pos) / np.log(_dd_gamma(alpha))).astype(np.int64)
        b, c = np.unique(idx, return_counts=True)
        out["bins"] = {int(k): int(v) for k, v in zip(b, c)}
    return _dd_collapse(out, max_bins)


def _dd_collapse(s: dict, max_bins: int) -> dict:
    bins = s["bins"]
    if len(bins) <= max_bins:
        return s
    keys = sorted(bins)
    keep_from = len(keys) - max_bins + 1
    low = sum(bins[k] for k in keys[:keep_from])
    merged = {keys[keep_from - 1]: low}
    for k in keys[keep_from:]:
        merged[k] = bins[k]
    return {"zero": s["zero"], "bins": merged}


def dd_merge(*parts: dict, max_bins: int = DD_MAX_BINS) -> dict:
    """Associative sparse-counter merge."""
    out = {"zero": 0, "bins": {}}
    for p in parts:
        out["zero"] += p["zero"]
        for k, v in p["bins"].items():
            out["bins"][k] = out["bins"].get(k, 0) + v
    return _dd_collapse(out, max_bins)


def dd_quantile(s: dict, q: float, alpha: float = DD_ALPHA) -> float:
    """Value estimate at quantile q (0 <= q <= 1): within relative
    error alpha of the true value at rank ceil(q*(n-1)) (uncollapsed
    bins; exact 0.0 when the rank falls in the zero counter)."""
    n = s["zero"] + sum(s["bins"].values())
    if n == 0:
        raise ValueError("empty sketch")
    rank = int(np.ceil(q * (n - 1)))
    if rank < s["zero"]:
        return 0.0
    gamma = _dd_gamma(alpha)
    cum = s["zero"]
    for k in sorted(s["bins"]):
        cum += s["bins"][k]
        if cum > rank:
            return 2.0 * gamma ** k / (gamma + 1.0)
    return 2.0 * gamma ** max(s["bins"]) / (gamma + 1.0)

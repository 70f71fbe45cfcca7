"""Winnowing rolling-hash fingerprints: reference implementation
cross-check (per-doc pure-Python Horner + window min), short-doc edge
cases, and the copy-detection pair semantics (df cutoff + shared
threshold) against a brute-force count."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from freemap_tiler_ray.stages.dedup import (WINNOW_MAXDF,
                                            WINNOW_MIN_SHARED,
                                            winnow_pairs)
from freemap_tiler_ray.stages.text import (FP_B, FP_K, FP_P, FP_W,
                                           winnow_fingerprints)


def _ref_fps(text: str) -> set[int]:
    n = len(text)
    hs = []
    for i in range(n - FP_K + 1):
        h = 0
        for ch in text[i:i + FP_K]:
            h = (h * FP_B + ord(ch)) % FP_P
        hs.append(h)
    return {min(hs[t:t + FP_W]) for t in range(n - FP_K - FP_W + 2)}


def test_matches_reference_and_short_docs():
    texts = ["the quick brown fox jumps over the lazy dog",
             "x" * 11,          # exactly span chars -> one fingerprint
             "y" * 10,          # one short of the span -> none
             "", "abc",         # far short -> none
             "the quick brown fox jumps over the lazy dog"]  # dup doc
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = winnow_fingerprints(t)
    got = {}
    for d, f in zip(out["doc_id"].to_pylist(), out["fp"].to_pylist()):
        got.setdefault(d, set()).add(f)
    for i, txt in enumerate(texts):
        exp = _ref_fps(txt) if len(txt) >= FP_K + FP_W - 1 else set()
        assert got.get(i, set()) == exp, i
    assert len(got.get(1, ())) == 1 and 2 not in got and 3 not in got


def test_pairs_match_bruteforce(ray_session):
    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(words, 40)) for _ in range(60)]
    texts += texts[:10]  # exact dups guarantee some pairs
    ids = np.arange(len(texts), dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})

    fps = winnow_fingerprints(t)
    by_doc = {}
    for d, f in zip(fps["doc_id"].to_pylist(), fps["fp"].to_pylist()):
        by_doc.setdefault(d, set()).add(f)
    df_count = {}
    for s in by_doc.values():
        for f in s:
            df_count[f] = df_count.get(f, 0) + 1
    rare = {f for f, c in df_count.items() if c <= WINNOW_MAXDF}
    exp = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            n = len(by_doc.get(a, set()) & by_doc.get(b, set()) & rare)
            if n >= WINNOW_MIN_SHARED:
                exp[(a, b)] = n
    assert exp, "fixture must produce at least one pair"

    ds = rd.from_arrow(t).repartition(4).map_batches(
        winnow_fingerprints, batch_format="pyarrow")
    got_df = winnow_pairs(ds).to_pandas()
    got = {(int(r.doc_a), int(r.doc_b)): int(r.n_shared)
           for r in got_df.itertuples()}
    assert got == exp

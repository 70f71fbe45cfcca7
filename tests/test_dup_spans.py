"""Exact-substring dedup (dup_spans) on a boilerplate-heavy corpus:
one 8-token gram occurs in EVERY doc (the degenerate case VERDICT r3
flagged). The round-4 rebuild tags occurrences via a hash join against
pre-aggregated counts, so no stage buffers a per-gram occurrence group;
this test pins correctness on that shape against a brute-force Python
reference."""

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from freemap_tiler_ray.pipelines.queries import DUP_L, dup_spans  # noqa: E402


def _brute(docs):
    """Reference: global gram counts, then per-doc maximal span merge."""
    from collections import Counter

    grams = Counter()
    per_doc = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        occ = []
        for i in range(len(toks) - DUP_L + 1):
            g = " ".join(toks[i:i + DUP_L])
            grams[g] += 1
            occ.append((i + 1, g))
        per_doc[doc_id] = occ
    out = {}
    for doc_id, occ in per_doc.items():
        starts = sorted(i for i, g in occ if grams[g] >= 2)
        if not starts:
            continue
        spans = []
        a = b = starts[0]
        cnt = 1
        for i in starts[1:]:
            if i - b < DUP_L:
                b = i
                cnt += 1
            else:
                spans.append((a, b, cnt))
                a = b = i
                cnt = 1
        spans.append((a, b, cnt))
        out[doc_id] = (len(spans), sum(c for *_, c in spans),
                       sum(b - a + DUP_L for a, b, _ in spans))
    return out


def test_boilerplate_gram_everywhere(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    boiler = " ".join(f"b{j}" for j in range(DUP_L))
    docs = []
    for d in range(300):
        words = [f"w{rng.integers(0, 40)}" for _ in range(30)]
        k = int(rng.integers(0, 20))
        body = " ".join(words[:k]) + " " + boiler + " " + " ".join(words[k:])
        docs.append((d, body.strip()))
    pq.write_table(
        pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                  "text": pa.array([t for _, t in docs], pa.string())}),
        str(tmp_path / "documents.parquet"))

    got = dup_spans(str(tmp_path)).to_pandas()
    ref = _brute(docs)
    assert len(got) == len(ref)
    for row in got.itertuples():
        assert ref[row.doc_id] == (row.n_dup_spans, row.dup_grams,
                                   row.dup_tokens), row.doc_id
    # the boilerplate gram occurs in all 300 docs -> every doc has a span
    assert len(got) == 300


def test_banded_lev_matches_duckdb():
    """_lev_block's band is exact for every distance <= EDIT_MAXD and
    saturates above it — property-checked against DuckDB levenshtein
    on random ragged strings (incl. empties)."""
    import duckdb

    from freemap_tiler_ray.pipelines.queries import (EDIT_MAXD, EDIT_PRE,
                                                     _lev_block)

    rng = np.random.default_rng(0)
    con = duckdb.connect()
    strs = []
    for _ in range(200):
        n = rng.integers(0, EDIT_PRE + 1)
        strs.append("".join(chr(97 + c) for c in rng.integers(0, 4, n)))
    P = 500
    ia = rng.integers(0, len(strs), P)
    ib = rng.integers(0, len(strs), P)
    A = np.zeros((P, EDIT_PRE), np.uint8)
    B = np.zeros((P, EDIT_PRE), np.uint8)
    la = np.zeros(P, np.int64)
    lb = np.zeros(P, np.int64)
    for k in range(P):
        a, b = strs[ia[k]].encode(), strs[ib[k]].encode()
        A[k, :len(a)] = np.frombuffer(a, np.uint8)
        la[k] = len(a)
        B[k, :len(b)] = np.frombuffer(b, np.uint8)
        lb[k] = len(b)
    d = _lev_block(A, la, B, lb)
    for k in range(P):
        ref = con.sql("select levenshtein(?, ?)",
                      params=[strs[ia[k]], strs[ib[k]]]).fetchone()[0]
        if ref <= EDIT_MAXD:
            assert d[k] == ref
        else:
            assert d[k] > EDIT_MAXD

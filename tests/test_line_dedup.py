"""line_dedup's rolling-hash line identity vs direct string grouping.

_line_dedup_explode identifies each LINE_W-token line by a 128-bit
double polynomial rolling hash over the batch's space-joined byte
buffer. These tests pin that identity against the ground truth (the
actual passage strings): equal passages must collide, distinct
passages must not, and the chars accounting must use CODEPOINT
lengths (the oracle's length()) even for multi-byte tokens.
No Ray session needed — the explode kernel is a pure batch function.
"""

import numpy as np
import pyarrow as pa

from freemap_tiler_ray.pipelines.queries import (LINE_W,
                                                 _line_dedup_explode)


def _expected(docs, W=LINE_W):
    """doc_id -> {passage: count} by direct Python string chunking."""
    out = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        cnt = {}
        for j in range(0, len(toks), W):
            p = " ".join(toks[j:j + W])
            cnt[p] = cnt.get(p, 0) + 1
        out[doc_id] = cnt
    return out


def _run(docs):
    t = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                  "text": pa.array([s for _, s in docs])})
    return _line_dedup_explode(t)


def _check(docs):
    res = _run(docs).to_pandas()
    exp = _expected(docs)
    # hash -> passage must be a bijection over the batch
    seen = {}
    n_rows = 0
    for doc_id, cnt in exp.items():
        sub = res[res["doc_id"] == doc_id]
        assert len(sub) == len(cnt), (doc_id, len(sub), len(cnt))
        n_rows += len(sub)
        assert int(sub["c"].sum()) == sum(cnt.values())
    assert len(res) == n_rows
    # group res rows by hash; each hash must correspond to exactly one
    # passage text (match on (count, chars) profile per doc)
    for (h1, h2), grp in res.groupby(["h1", "h2"]):
        profiles = set()
        for _, row in grp.iterrows():
            c = int(row["c"])
            assert row["chars"] % c == 0
            profiles.add(int(row["chars"]) // c)   # codepoint length
        assert len(profiles) == 1, "one hash, two line lengths"
    # distinct passages -> distinct hashes: count unique hashes equals
    # count unique passages across the batch
    all_passages = set()
    for cnt in exp.values():
        all_passages.update(cnt)
    assert res.groupby(["h1", "h2"]).ngroups == len(all_passages)
    # chars = c * codepoint-length for a known row
    for doc_id, cnt in exp.items():
        sub = res[res["doc_id"] == doc_id]
        got = sorted((int(r["c"]), int(r["chars"])) for _, r in
                     sub.iterrows())
        want = sorted((c, c * len(p)) for p, c in cnt.items())
        assert got == want, (doc_id, got, want)


def test_shared_and_unique_lines():
    w = LINE_W
    shared = " ".join(["tok%d" % i for i in range(w)])
    docs = [
        (0, shared + " " + " ".join("a%d" % i for i in range(w))),
        (1, shared + " " + " ".join("b%d" % i for i in range(w))),
        (2, " ".join("c%d" % i for i in range(w))),
    ]
    _check(docs)


def test_short_remainder_and_empty():
    docs = [(0, "x y z"), (1, ""), (2, "x y z"), (3, "x")]
    _check(docs)


def test_multibyte_tokens_use_codepoint_lengths():
    w = LINE_W
    docs = [(0, " ".join(["héllo", "日本語", "naïve"] * w)[:200].rsplit(
        " ", 1)[0]),
            (1, " ".join("plain%d" % i for i in range(w + 3)))]
    _check(docs)


def test_repeated_line_within_one_doc_counts_occurrences():
    w = LINE_W
    line = " ".join("t%d" % i for i in range(w))
    docs = [(0, line + " " + line), (1, "solo")]
    res = _run(docs).to_pandas()
    d0 = res[res["doc_id"] == 0]
    assert len(d0) == 1 and int(d0["c"].iloc[0]) == 2


def test_random_corpus_matches_string_grouping():
    rng = np.random.default_rng(7)
    vocab = ["w%d" % i for i in range(30)]
    docs = []
    for d in range(40):
        n = int(rng.integers(1, 60))
        docs.append((d, " ".join(rng.choice(vocab, n))))
    # inject exact duplicate docs so cross-doc dup lines exist
    docs.append((40, docs[0][1]))
    docs.append((41, docs[1][1]))
    _check(docs)

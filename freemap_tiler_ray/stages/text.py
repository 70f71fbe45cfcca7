"""Text-analysis stages: tokenization, quality scoring, language-ID
heuristic, document fingerprinting (training-data-pipeline layer).

All per-batch bodies are vectorized (pandas str ops / numpy); the only
per-row Python is md5 fingerprinting (stdlib hashlib; at scale this
stage runs in an actor pool where a faster hash plugs in via __init__).
Every derivation is mirrored term-for-term by a DuckDB oracle in
__ray_entry__ (same split char, same regex, same division structure).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

# BPE-ish token regex: letter runs | digit runs | single non-space symbol
TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

STOPWORDS = ("the", "a", "of", "and", "is")
LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
}


class TextStatsStage:
    """(doc_id, text) -> token/quality statistics. Stateful: the token
    regex is compiled once per actor."""

    def __init__(self):
        self.token_re = re.compile(TOKEN_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.select(["doc_id", "text"]).to_pandas()
        toks = df["text"].str.split(" ")
        n_tokens = toks.str.len().astype(np.int64)
        n_unique = toks.map(lambda t: len(set(t))).astype(np.int64)
        n_stop = toks.map(lambda t: sum(w in STOPWORDS for w in t)).astype(np.int64)
        n_bpe = df["text"].str.lower().map(
            lambda s: len(self.token_re.findall(s))).astype(np.int64)
        n_chars = df["text"].str.len().astype(np.int64)
        return pa.table({
            "doc_id": pa.array(df["doc_id"], pa.int64()),
            "n_chars_calc": pa.array(n_chars),
            "n_tokens": pa.array(n_tokens),
            "n_bpe_tokens": pa.array(n_bpe),
            "n_unique": pa.array(n_unique),
            "uniq_ratio": pa.array(n_unique.to_numpy().astype(np.float64)
                                   / n_tokens.to_numpy().astype(np.float64)),
            "stop_ratio": pa.array(n_stop.to_numpy().astype(np.float64)
                                   / n_tokens.to_numpy().astype(np.float64)),
        })


def lang_id(batch: pa.Table) -> pa.Table:
    """n-gram/stopword-marker language heuristic: argmax of per-language
    marker counts with fixed precedence en > de > fr, 'und' when all
    zero. (The testdata's `lang` column is unrelated synthetic metadata;
    the oracle mirrors this heuristic, not that column.)"""
    df = batch.select(["doc_id", "text"]).to_pandas()
    toks = df["text"].str.split(" ")
    scores = {lang: toks.map(lambda t, m=set(markers): sum(w in m for w in t))
                        .astype(np.int64).to_numpy()
              for lang, markers in LANG_MARKERS.items()}
    en, de, fr = scores["en"], scores["de"], scores["fr"]
    pred = np.where((en >= de) & (en >= fr) & (en > 0), "en",
                    np.where((de >= fr) & (de > 0), "de",
                             np.where(fr > 0, "fr", "und")))
    return pa.table({"doc_id": pa.array(df["doc_id"], pa.int64()),
                     "lang_pred": pa.array(pred.tolist(), pa.string()),
                     "en_score": pa.array(en), "de_score": pa.array(de),
                     "fr_score": pa.array(fr)})


def md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def fingerprint(batch: pa.Table) -> pa.Table:
    """Normalized-content fingerprint: md5(lower(trim(text))) — the exact
    dedup key (SQL mirror: md5(lower(trim(text))))."""
    df = batch.select(["doc_id", "text"]).to_pandas()
    norm = df["text"].str.strip().str.lower()
    fps = [md5_hex(s) for s in norm]
    return pa.table({"doc_id": pa.array(df["doc_id"], pa.int64()),
                     "fingerprint": pa.array(fps, pa.string())})


def shingle_hashes(texts: pd.Series, k: int = 3):
    """Per doc: sorted unique 60-bit hashes of the k-word shingles
    (hash = int(md5(shingle)[:15], 16), mirroring DuckDB's
    ('0x' || substr(md5(s), 1, 15))::BIGINT). Docs with fewer than k
    tokens hash the whole text as one shingle."""
    out = []
    for t in texts:
        toks = t.split(" ")
        if len(toks) < k:
            sh = [t]
        else:
            sh = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
        hs = np.unique(np.array(
            [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in sh],
            dtype=np.int64))
        out.append(hs)
    return out

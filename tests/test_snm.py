"""sorted_neighbor_pairs: the rank-bucket meets-once replication is
exact under forced bucket-boundary pressure (tiny SNM_BUCKET), and
exact global ranks come out of the histogram-offset path without a
global sort."""

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from freemap_tiler_ray.pipelines import queries as q  # noqa: E402


def _brute(df: pd.DataFrame, w: int) -> set:
    o = df.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
    ids = o["doc_id"].to_numpy()
    out = set()
    for d in range(1, w + 1):
        for a, b in zip(ids[:-d], ids[d:]):
            out.add((int(a), int(b), d))
    return out


@pytest.fixture()
def tiny_docs(tmp_path):
    rng = np.random.default_rng(7)
    n = 300
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        # heavy length ties force multi-row rank groups
        "n_chars": rng.integers(10, 40, n).astype(np.int64),
        "text": ["x"] * n,
        "lang": ["en"] * n,
        "source": ["s"] * n,
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    return str(tmp_path), df


def test_snm_pairs_boundary_pressure(ray_session, tiny_docs, monkeypatch):
    """SNM_BUCKET = 16 << 300 ranks: every bucket boundary carries,
    and every within-window pair still meets exactly once."""
    sf_dir, df = tiny_docs
    monkeypatch.setattr(q, "SNM_BUCKET", 16)
    got = q.sorted_neighbor_pairs(sf_dir).to_pandas()
    pairs = set(zip(got["doc_a"].astype(int), got["doc_b"].astype(int),
                    got["gap"].astype(int)))
    assert len(pairs) == len(got), "a pair met more than once"
    assert pairs == _brute(df, q.SNM_W)


def test_snm_len_diff_payload(ray_session, tiny_docs, monkeypatch):
    sf_dir, df = tiny_docs
    monkeypatch.setattr(q, "SNM_BUCKET", 32)
    got = q.sorted_neighbor_pairs(sf_dir).to_pandas()
    nc = df.set_index("doc_id")["n_chars"]
    ld = (nc.loc[got["doc_b"].to_numpy()].to_numpy()
          - nc.loc[got["doc_a"].to_numpy()].to_numpy())
    assert (got["len_diff"].to_numpy() == ld).all()
    # sorted order: n_chars(b) >= n_chars(a) for every emitted pair
    assert (ld >= 0).all()

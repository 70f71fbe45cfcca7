"""Bloom singleton-prefilter (_keep_multi_keys) exactness, in
particular the cross-block path: a key occurring once in each of two
DIFFERENT blocks must be kept (the (seen, dup) monoid's s_i & s_j
term), while single-occurrence keys are dropped. Also checks that the
candidate-only reshingling path of lsh_candidate_pairs (docs_ds given)
returns exactly the same pairs as the self-contained path."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from freemap_tiler_ray.stages.dedup import (_keep_multi_keys, doc_shingles,
                                            lsh_candidate_pairs)

SF = "/root/testdata/sf0.001"


def test_cross_block_multi_keys_kept(ray_session):
    # multi-keys 1000..1019 appear exactly twice, at opposite ends of
    # the row order, so a range repartition puts the two occurrences in
    # different blocks; singletons 1..900 appear once.
    multi = np.arange(1000, 1020, dtype=np.int64)
    singles = np.arange(1, 901, dtype=np.int64)
    keys = np.concatenate([multi, singles, multi[::-1]])
    ds = rd.from_arrow(pa.table({"band_key": pa.array(keys, pa.int64()),
                                 "doc_id": pa.array(
                                     np.arange(len(keys)), pa.int64())}))
    ds = ds.repartition(8)
    kept = _keep_multi_keys(ds, "band_key").to_pandas()["band_key"].to_numpy()
    # exactness: every true multi-key row survives (2 rows per key)
    for k in multi:
        assert (kept == k).sum() == 2, k
    # effectiveness: singletons are (deterministically, at this key
    # count vs 2^23 bits) all filtered out
    assert np.isin(kept, singles).sum() == 0
    assert len(kept) == 2 * len(multi)


def test_single_block_multi_keys_kept(ray_session):
    keys = np.array([5, 5, 5, 9, 9, 11], dtype=np.int64)
    ds = rd.from_arrow(pa.table({"k": pa.array(keys, pa.int64())}))
    kept = np.sort(_keep_multi_keys(ds, "k").to_pandas()["k"].to_numpy())
    assert kept.tolist() == [5, 5, 5, 9, 9]


def test_lsh_candidate_docs_path_matches_selfcontained(ray_session):
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    shingled = docs.map_batches(doc_shingles, batch_format="pyarrow")

    def norm(ds):
        df = ds.to_pandas().sort_values(["doc_a", "doc_b"])
        return df.reset_index(drop=True)

    base = norm(lsh_candidate_pairs(shingled))
    fast = norm(lsh_candidate_pairs(shingled, docs_ds=docs,
                                    shingle_fn=doc_shingles))
    assert base.equals(fast)

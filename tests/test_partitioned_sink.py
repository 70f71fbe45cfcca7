"""Resumable partitioned-parquet sink: atomic commit, skip-on-resume,
read-back equivalence, deterministic partition ids."""

import os
import shutil

import numpy as np
import pandas as pd
import pytest

from freemap_tiler_ray.sources.partitioned_sink import (done_partitions,
                                                        partition_ids,
                                                        read_partitioned,
                                                        write_partitioned)

SF = "/root/testdata/sf0.001/documents.parquet"
N_PARTS = 8


@pytest.fixture
def out_dir(tmp_path):
    return str(tmp_path / "sink")


def _docs_ds():
    from freemap_tiler_ray.sources.pq import read_parquet
    return read_parquet(SF, columns=["doc_id", "lang", "n_chars"]) \
        .repartition(4)


def test_partition_ids_deterministic_and_spread():
    keys = np.arange(10_000, dtype=np.int64)
    a = partition_ids(keys, N_PARTS)
    b = partition_ids(keys, N_PARTS)
    assert np.array_equal(a, b)
    counts = np.bincount(a, minlength=N_PARTS)
    assert counts.min() > 0.5 * counts.mean()    # no empty/starved part


def test_write_then_read_roundtrip(ray_session, out_dir):
    res = write_partitioned(_docs_ds(), out_dir, "doc_id", N_PARTS)
    assert res["skipped"] == []
    assert set(res["written"]) == done_partitions(out_dir, N_PARTS)
    back = read_partitioned(out_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exp = pd.read_parquet(SF, columns=["doc_id", "lang", "n_chars"]) \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back[exp.columns], exp)


def test_resume_skips_committed_and_rewrites_torn(ray_session, out_dir):
    write_partitioned(_docs_ds(), out_dir, "doc_id", N_PARTS)
    # simulate a crash: partition 0 torn (marker gone), partition 1
    # fully lost
    shutil.rmtree(os.path.join(out_dir, "part=1"))
    os.remove(os.path.join(out_dir, "part=0", "_SUCCESS"))
    res = write_partitioned(_docs_ds(), out_dir, "doc_id", N_PARTS)
    assert sorted(res["written"]) == [0, 1]
    assert sorted(res["skipped"]) == list(range(2, N_PARTS))
    back = read_partitioned(out_dir).to_pandas()
    exp = pd.read_parquet(SF)
    assert len(back) == len(exp)
    assert sorted(back["doc_id"]) == sorted(exp["doc_id"])


def test_resume_noop_when_all_done(ray_session, out_dir):
    write_partitioned(_docs_ds(), out_dir, "doc_id", N_PARTS)
    res = write_partitioned(_docs_ds(), out_dir, "doc_id", N_PARTS)
    assert res["written"] == []
    assert sorted(res["skipped"]) == list(range(N_PARTS))


def test_mismatched_layout_rejected(ray_session, out_dir):
    write_partitioned(_docs_ds(), out_dir, "doc_id", N_PARTS)
    with pytest.raises(ValueError, match="partitions"):
        write_partitioned(_docs_ds(), out_dir, "doc_id", N_PARTS * 2)

"""Regression test for the hash-shuffle schema-loss workaround.

Ray 2.49 drops a join side's schema when the FIRST block submitted for
that side is empty (see freemap_tiler_ray/ray_patches.py for the full
mechanics); any hash partition whose rows all filtered out then joins a
zero-column table and raises ArrowInvalid.  This was the cause of the
nondeterministic `q17_small_qty` failure observed in full-suite runs:
q17's brand filter emits 0-row blocks, and whichever of them reached the
join's shuffle operator first poisoned the schema broadcast.

The repro is deterministic: a two-block right side whose first block is
empty and whose single data row hashes into one of 8 partitions, so the
other partitions receive no non-empty shard.
"""

import numpy as np
import pyarrow as pa
import ray

import freemap_tiler_ray  # noqa: F401 - applies ray_patches on import
from freemap_tiler_ray import ray_patches


def test_patch_applied():
    assert ray_patches.apply()


def test_join_with_empty_first_block(ray_session):
    left = ray.data.from_arrow(
        pa.table({"k": pa.array(np.arange(16), pa.int64()),
                  "v": pa.array(np.ones(16), pa.float64())}))
    empty = pa.table({"p2": pa.array([], pa.int64()),
                      "w": pa.array([], pa.int64())})
    one = pa.table({"p2": pa.array([3], pa.int64()),
                    "w": pa.array([7], pa.int64())})
    right = ray.data.from_arrow([empty, one])
    j = left.join(right, join_type="inner", num_partitions=8,
                  on=("k",), right_on=("p2",))
    out = j.take_all()
    assert len(out) == 1
    assert out[0]["k"] == 3 and out[0]["w"] == 7


def test_join_with_zero_column_first_block(ray_session):
    """Mechanism 2: upstream hash aggregates finalize key-empty
    partitions as zero-COLUMN empty blocks; if one of those reaches the
    join's shuffle first, the broadcast 'schema' has no columns.  The
    finalize-level patch rebuilds the side from the recorded schema (or
    returns an empty block for inner joins)."""
    left = ray.data.from_arrow(
        pa.table({"k": pa.array(np.arange(16), pa.int64()),
                  "v": pa.array(np.ones(16), pa.float64())}))
    zerocol = pa.table({})
    one = pa.table({"p2": pa.array([3], pa.int64()),
                    "w": pa.array([7], pa.int64())})
    right = ray.data.from_arrow([zerocol, one])
    j = left.join(right, join_type="inner", num_partitions=8,
                  on=("k",), right_on=("p2",))
    out = j.take_all()
    assert len(out) == 1
    assert out[0]["k"] == 3 and out[0]["w"] == 7


def test_aggregate_into_join(ray_session):
    """End-to-end shape of the original q17 failure: a selective filter
    (empty blocks) -> groupby aggregate (zero-column empties for
    key-empty partitions) -> join back onto the filtered stream."""
    from ray.data.aggregate import Count, Sum

    blocks = []
    for i in range(8):
        # most blocks filter to empty; two carry a single part key
        if i in (3, 6):
            blocks.append(pa.table({"pk": pa.array([i], pa.int64()),
                                    "qty": pa.array([10 * i], pa.int64())}))
        else:
            blocks.append(pa.table({"pk": pa.array([], pa.int64()),
                                    "qty": pa.array([], pa.int64())}))
    li = ray.data.from_arrow(blocks)
    stats = (li.groupby("pk")
             .aggregate(Sum("qty", alias_name="qty_sum"),
                        Count(alias_name="qty_cnt"))
             .map_batches(lambda t: pa.table({"p2": t["pk"],
                                              "qty_sum": t["qty_sum"]}),
                          batch_format="pyarrow"))
    j = li.join(stats, join_type="inner", num_partitions=8,
                on=("pk",), right_on=("p2",))
    rows = sorted(j.take_all(), key=lambda r: r["pk"])
    assert [r["pk"] for r in rows] == [3, 6]
    assert [r["qty_sum"] for r in rows] == [30, 60]


def test_join_with_both_sides_empty_first_block(ray_session):
    le = pa.table({"k": pa.array([], pa.int64()),
                   "v": pa.array([], pa.float64())})
    ld = pa.table({"k": pa.array([5], pa.int64()),
                   "v": pa.array([2.0], pa.float64())})
    re = pa.table({"p2": pa.array([], pa.int64()),
                   "w": pa.array([], pa.int64())})
    rd = pa.table({"p2": pa.array([5, 9], pa.int64()),
                   "w": pa.array([1, 2], pa.int64())})
    j = ray.data.from_arrow([le, ld]).join(
        ray.data.from_arrow([re, rd]), join_type="inner",
        num_partitions=8, on=("k",), right_on=("p2",))
    out = j.take_all()
    assert len(out) == 1
    assert out[0]["v"] == 2.0 and out[0]["w"] == 1


def test_version_guard_raises_on_mismatch(monkeypatch):
    """A Ray upgrade must fail LOUDLY at apply(), not silently skip."""
    import pytest
    import ray as ray_mod

    monkeypatch.setattr(ray_mod, "__version__", "2.50.0")
    with pytest.raises(RuntimeError, match="FTR_NO_RAY_PATCHES"):
        ray_patches.apply()
    # kill-switch still works under the mismatched version
    monkeypatch.setenv("FTR_NO_RAY_PATCHES", "1")
    assert ray_patches.apply() is False


def test_shuffle_wrap_is_idempotent(monkeypatch):
    """Partial apply() failure must not stack _shuffle_block wrappers:
    the wrapped fn carries a sentinel and per-patch flags gate re-runs."""
    from ray.data._internal.execution.operators import hash_shuffle as hs

    fn_before = hs._shuffle_block._function
    assert getattr(fn_before, "_ftr_schema_safe", False)
    # Simulate the join patch having failed so apply() re-enters the
    # not-fully-applied path, then verify the shuffle wrap is not redone.
    monkeypatch.setattr(ray_patches, "_JOIN_APPLIED", False)
    monkeypatch.setattr(ray_patches, "_SHUFFLE_APPLIED", False)
    assert ray_patches.apply()
    assert hs._shuffle_block._function is fn_before or \
        hs._shuffle_block._function.__name__ == fn_before.__name__
    # the double-wrap guard: orig seen by a re-run is already marked
    assert getattr(hs._shuffle_block._function, "_ftr_schema_safe", False)


def test_join_subclass_importable_without_apply():
    """Aggregator actors unpickle _SchemaSafeJoinAggregation by module
    reference; it must exist at import time even when apply() is skipped
    (FTR_NO_RAY_PATCHES on a worker while the driver patched)."""
    import importlib
    import subprocess
    import sys

    assert ray_patches._SchemaSafeJoinAggregation is not None
    code = (
        "import os; os.environ['FTR_NO_RAY_PATCHES'] = '1'\n"
        "from freemap_tiler_ray import ray_patches as rp\n"
        "assert rp.apply() is False\n"
        "assert rp._SchemaSafeJoinAggregation is not None\n"
        "print('ok')\n"
    )
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=120,
                         cwd="/root/repo")
    assert out.returncode == 0 and "ok" in out.stdout, out.stderr


def test_full_outer_join_after_map_groups_empty_partitions(ray_session):
    """Canary for the map_groups -> two-key full_outer join shape
    (round-4 session-IV find): a groupby().map_groups stage whose hash
    partitions are mostly EMPTY emits zero-column blocks downstream.
    This small case passes because every join-aggregator actor still
    sees a row-bearing shard of each side; the KNOWN RESIDUAL (see
    ray_patches) is the sparse-side outer join where an actor sees no
    row-bearing shard of one side at all — its schema is then locally
    unknowable and finalize must fail (queries.dedup_eval was moved to
    union+groupby for exactly that reason). If a Ray upgrade changes
    either behavior, this canary and test_ray_patches' guards fire."""
    import pandas as pd

    def mk(tag):
        t = pa.table({
            "doc_a": pa.array([1, 2, 3], pa.int64()),
            "doc_b": pa.array([10, 20, 30], pa.int64()),
            tag: pa.array([1, 1, 1], pa.int64()),
            "_part": pa.array([0, 0, 0], pa.int64())})

        def ident(g: pd.DataFrame) -> pd.DataFrame:
            return g.drop(columns=["_part"])

        # 32 hash partitions, rows only in one -> 31 empty partitions
        # emit zero-column blocks downstream of map_groups
        return (ray.data.from_arrow(t).groupby("_part")
                .map_groups(ident, batch_format="pandas"))

    left = mk("p")
    right = (mk("t").map_batches(
        lambda b: b.rename_columns(["ta", "tb", "t"]),
        batch_format="pyarrow"))
    j = left.join(right, join_type="full_outer", num_partitions=8,
                  on=("doc_a", "doc_b"), right_on=("ta", "tb"))
    out = j.to_pandas()
    assert len(out) == 3
    assert sorted(out["p"].fillna(0).astype(int)) == [1, 1, 1]

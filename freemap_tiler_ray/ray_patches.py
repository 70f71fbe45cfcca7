"""Workarounds for upstream Ray Data defects, applied at import.

Ray 2.49's hash-shuffle join can end up joining a zero-COLUMN partition
table, raising ``ArrowInvalid: No match or multiple matches for key
field reference FieldRef.Name(<key>)``.  Two distinct mechanisms feed
it (all code in ``ray/data/_internal/execution/operators/``):

1. Empty FIRST block suppresses the schema broadcast
   (``hash_shuffle.py``): the driver sets ``send_empty_blocks=True`` on
   the first shuffle task of each input so aggregators learn the schema
   from empty shards, and immediately marks
   ``_has_schemas_broadcasted[input_index] = True`` — but the remote
   ``_shuffle_block`` early-returns on a 0-row block BEFORE fanning out
   those schema shards.  Every later task drops its empty shards, so a
   hash partition whose rows all filtered out receives ZERO blocks and
   ``JoinAggregation.finalize`` builds it as
   ``ArrowBlockBuilder().build()`` -> zero columns.

2. Upstream hash AGGREGATES emit zero-column empties
   (``hash_aggregate.py``): a groupby/aggregate finalizes its
   key-empty partitions as schema-less ``_empty_table()`` blocks.
   Map operators skip 0-row blocks, so these flow unchanged into a
   downstream join; whichever reaches the join's shuffle first becomes
   the "schema" broadcast — of zero columns.  (aggregate -> join is the
   classic correlated-aggregate shape, e.g. TPC-H Q17.)

Both are nondeterministic in real pipelines (they depend on which block
reaches the shuffle operator first), which made them look like flakes
in long test runs.  `tests/test_ray_patches.py` holds deterministic
repros for each.

Three defense layers, applied by `apply()`:

- ``_shuffle_block`` wrap: an empty block with
  ``send_empty_blocks=True`` still broadcasts one empty schema-carrying
  shard to every partition (exactly what the non-empty path does for
  key-empty partitions).
- ``JoinAggregation.accept`` wrap: records the first WITH-schema shard
  seen per input sequence on the aggregation instance.
- ``JoinAggregation.finalize`` replacement: a side whose partition
  built to zero columns is substituted with an empty table of the
  recorded schema; if no schema was ever seen for that side (globally
  empty input) and the join type can produce no rows from an empty
  side (inner/semi), it returns a zero-column empty block — the same
  convention Ray's own aggregates use — instead of crashing.

Pinned to Ray 2.49.x internals: ``apply()`` raises loudly on any other
Ray version (re-validate the patches against the new internals, then
bump ``_PINNED_RAY_PREFIX`` — or set ``FTR_NO_RAY_PATCHES=1`` to run
unpatched). Within 2.49.x, if an expected internal is missing the
individual patch skips and native joins fall back to upstream behavior.
"""

from __future__ import annotations

# Per-patch applied flags: a partial failure must not re-run the
# successful patch on the next apply() (re-wrapping _shuffle_block
# would stack wrappers).
_SHUFFLE_APPLIED = False
_JOIN_APPLIED = False

_PINNED_RAY_PREFIX = "2.49."


def _check_ray_version() -> None:
    import ray

    if not ray.__version__.startswith(_PINNED_RAY_PREFIX):
        raise RuntimeError(
            f"freemap_tiler_ray.ray_patches is pinned to Ray "
            f"{_PINNED_RAY_PREFIX}x internals but found Ray "
            f"{ray.__version__}. Re-validate the hash-shuffle/join "
            f"schema patches against the new internals (they may be "
            f"fixed upstream) and bump _PINNED_RAY_PREFIX, or set "
            f"FTR_NO_RAY_PATCHES=1 to run unpatched.")


def apply() -> bool:
    """Apply all patches (idempotent per patch). Returns True if active.

    ``FTR_NO_RAY_PATCHES=1`` skips them (A/B and upstream-fix escape
    hatch). Any non-2.49.x Ray raises (see _check_ray_version)."""
    import os

    global _SHUFFLE_APPLIED, _JOIN_APPLIED
    if os.environ.get("FTR_NO_RAY_PATCHES") == "1":
        return False
    _check_ray_version()
    if not _SHUFFLE_APPLIED:
        _SHUFFLE_APPLIED = _apply_hash_shuffle_schema_fix()
    if not _JOIN_APPLIED:
        _JOIN_APPLIED = _apply_join_finalize_schema_fix()
    return _SHUFFLE_APPLIED and _JOIN_APPLIED


def _apply_hash_shuffle_schema_fix() -> bool:
    try:
        import ray
        from ray.data._internal.execution.operators import hash_shuffle as hs
        from ray.data._internal.table_block import TableBlockAccessor
        from ray.data.block import BlockAccessor, BlockExecStats, BlockType

        orig = hs._shuffle_block._function  # raw python fn of the remote
        if getattr(orig, "_ftr_schema_safe", False):
            return True  # already wrapped (belt-and-braces vs the flag)
    except Exception:  # pragma: no cover - future Ray refactor
        return False

    def _shuffle_block_schema_safe(
        block,
        input_index,
        key_columns,
        pool,
        block_transformer=None,
        send_empty_blocks=False,
        override_partition_id=None,
    ):
        # Apply the transform once here so the emptiness check below sees
        # the block the original would have seen (delegate with None).
        if block_transformer is not None:
            block = block_transformer(block)
        block = TableBlockAccessor.try_convert_block_type(
            block, block_type=BlockType.ARROW
        )
        if send_empty_blocks and block.num_rows == 0:
            stats = BlockExecStats.builder()
            shard = hs._create_empty_table(block.schema)
            waits = [
                pool.get_aggregator_for_partition(pid).submit.remote(
                    input_index, pid, ray.put(shard)
                )
                for pid in range(pool.num_partitions)
            ]
            ray.get(waits)
            meta = BlockAccessor.for_block(block).get_metadata(
                exec_stats=stats.build()
            )
            return meta, {}
        return orig(
            block,
            input_index,
            key_columns,
            pool,
            None,
            send_empty_blocks,
            override_partition_id,
        )

    _shuffle_block_schema_safe._ftr_schema_safe = True
    hs._shuffle_block = ray.remote(_shuffle_block_schema_safe)
    return True


def _build_join_subclass():
    # NOTE: methods monkey-patched onto Ray's class would NOT reach the
    # aggregator ACTORS (classes pickle by reference; workers reimport
    # the unpatched original).  Instead we define an importable SUBCLASS
    # and rebind the name JoinOperator's factory lambda closes over —
    # workers unpickle the closure, import this module, and get the
    # subclass.  The class is built at MODULE IMPORT (not inside
    # apply()) so it is always resolvable for unpickling, even in a
    # process where FTR_NO_RAY_PATCHES=1 or apply() failed while the
    # driver DID apply the patch.
    try:
        from ray.data._internal.arrow_block import ArrowBlockAccessor
        from ray.data._internal.execution.operators import join as rj
        from ray.data._internal.execution.operators.hash_shuffle import (
            _create_empty_table,
        )
        from ray.data._internal.logical.operators.join_operator import JoinType

        base = rj.JoiningShuffleAggregation
        if base.__name__ == "_SchemaSafeJoinAggregation":
            return base  # module re-import after a prior rebind
        _JT = rj._JOIN_TYPE_TO_ARROW_JOIN_VERB_MAP
    except Exception:  # pragma: no cover - future Ray refactor
        return None

    class _SchemaSafeJoinAggregation(base):
        def accept(self, input_seq_id, partition_id, partition_shard):
            # Remember the first WITH-schema shard per input sequence: a
            # zero-column partition can then be rebuilt as a typed empty.
            try:
                if getattr(partition_shard, "num_columns", 0) > 0:
                    seen = getattr(self, "_ftr_seen_schema", None)
                    if seen is None:
                        seen = self._ftr_seen_schema = {}
                    if input_seq_id not in seen:
                        seen[input_seq_id] = partition_shard.schema
            except Exception:
                pass
            # Known residual (documented, not patched): an OUTER join
            # whose sparse side sends NO row-bearing shard to a given
            # aggregator ACTOR leaves that side's schema unknowable
            # there — null columns for the outer result cannot be
            # typed, so finalize falls through to the upstream error.
            # Pipelines joining a very sparse table outer-style should
            # use union+groupby instead (see queries.dedup_eval).
            return super().accept(input_seq_id, partition_id, partition_shard)

        def finalize(self, partition_id):
            left = self._get_partition_builder(
                input_seq_id=0, partition_id=partition_id).build()
            right = self._get_partition_builder(
                input_seq_id=1, partition_id=partition_id).build()
            seen = getattr(self, "_ftr_seen_schema", {})

            def _fix(t, seq):
                if t.num_columns > 0:
                    return t
                if seq in seen:
                    return _create_empty_table(seen[seq])
                return None  # schema unknowable (globally empty side)

            lf, rf = _fix(left, 0), _fix(right, 1)
            if lf is not None and rf is not None:
                return lf.join(
                    rf,
                    join_type=_JT[self._join_type],
                    keys=list(self._left_key_col_names),
                    right_keys=list(self._right_key_col_names),
                    left_suffix=self._left_columns_suffix,
                    right_suffix=self._right_columns_suffix,
                )
            # One side has no schema anywhere (globally empty input).
            # Where the join semantics make the result derivable, return
            # it; the zero-column empty follows Ray's own aggregate
            # convention for key-empty partitions.
            jt = self._join_type
            empty = ArrowBlockAccessor._empty_table()
            if lf is None and rf is None:
                return empty
            if rf is None:  # right side globally empty
                if jt == JoinType.LEFT_ANTI:
                    return lf  # no right rows -> every left row survives
                if jt in (JoinType.INNER, JoinType.LEFT_SEMI,
                          JoinType.RIGHT_SEMI, JoinType.RIGHT_ANTI,
                          JoinType.RIGHT_OUTER):
                    return empty
                if lf.num_rows == 0:  # outer joins of two empties
                    return empty
            else:  # left side globally empty
                if jt == JoinType.RIGHT_ANTI:
                    return rf
                if jt in (JoinType.INNER, JoinType.LEFT_SEMI,
                          JoinType.RIGHT_SEMI, JoinType.LEFT_ANTI,
                          JoinType.LEFT_OUTER):
                    return empty
                if rf.num_rows == 0:
                    return empty
            # Outer join needing null columns of an unknowable schema:
            # fall through to the original (and its original error).
            return super().finalize(partition_id)

    _SchemaSafeJoinAggregation.__module__ = __name__
    _SchemaSafeJoinAggregation.__qualname__ = "_SchemaSafeJoinAggregation"
    return _SchemaSafeJoinAggregation


# Built unconditionally at import so aggregator actors can always
# unpickle it by reference; apply() only REBINDS Ray's name to it.
_SchemaSafeJoinAggregation = _build_join_subclass()


def _apply_join_finalize_schema_fix() -> bool:
    if _SchemaSafeJoinAggregation is None:
        return False  # pragma: no cover - future Ray refactor
    from ray.data._internal.execution.operators import join as rj

    rj.JoiningShuffleAggregation = _SchemaSafeJoinAggregation
    return True

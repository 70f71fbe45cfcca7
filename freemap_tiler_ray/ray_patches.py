"""Workarounds for upstream Ray Data defects, applied at import.

ONE patch is active: `apply_hash_shuffle_schema_fix`.

Ray 2.49's hash-shuffle join loses a join side's schema when the FIRST
block submitted for that side has zero rows (common right after a
selective `map_batches` filter).  Mechanics, all in
`ray/data/_internal/execution/operators/hash_shuffle.py`:

- the driver sets ``send_empty_blocks=True`` on the first shuffle task
  of each input so aggregators learn the schema from empty shards, and
  immediately marks ``_has_schemas_broadcasted[input_index] = True``;
- but the remote ``_shuffle_block`` early-returns on a 0-row block
  BEFORE fanning out those schema shards;
- every later (non-first) task drops its empty shards, so any hash
  partition whose rows all filtered out receives ZERO blocks;
- ``JoinAggregation.finalize`` then builds that side's partition with
  ``ArrowBlockBuilder().build()`` -> a zero-COLUMN table, and
  ``pa.Table.join`` raises
  ``ArrowInvalid: No match or multiple matches for key field reference
  FieldRef.Name(<key>)``.

The failure is nondeterministic in real pipelines (it depends on which
block reaches the shuffle operator first), which made it look like a
flake in long test runs.  `tests/test_ray_patches.py` holds a
deterministic two-block repro.

The fix wraps ``_shuffle_block`` so an empty block with
``send_empty_blocks=True`` still broadcasts one empty schema-carrying
shard to every partition (exactly what the non-empty path does for
key-empty partitions); non-empty blocks delegate to the original
function unchanged.  Version-guarded: if Ray's internals move, the
patch silently skips and native joins fall back to upstream behavior.
"""

from __future__ import annotations

_APPLIED = False


def apply() -> bool:
    """Apply all patches (idempotent). Returns True if active."""
    global _APPLIED
    if _APPLIED:
        return True
    _APPLIED = _apply_hash_shuffle_schema_fix()
    return _APPLIED


def _apply_hash_shuffle_schema_fix() -> bool:
    try:
        import ray
        from ray.data._internal.execution.operators import hash_shuffle as hs
        from ray.data._internal.table_block import TableBlockAccessor
        from ray.data.block import BlockAccessor, BlockExecStats, BlockType

        orig = hs._shuffle_block._function  # raw python fn of the remote
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

    hs._shuffle_block = ray.remote(_shuffle_block_schema_safe)
    return True

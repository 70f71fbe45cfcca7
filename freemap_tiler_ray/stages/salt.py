"""Hot-key salting for grouped computations (north-rule skew handling).

Where it applies here:
- Grouped AGGREGATES over skewed keys: salting splits a hot key's rows
  across `n_salt` sub-groups, aggregates partials per (key, salt), then
  merges per key — two small shuffles instead of one straggler.
  (Our built-in aggregate paths — cell counts, span counts — already
  pre-aggregate inside map_batches, which bounds skew even harder; this
  utility is for map_groups-style grouped computations that cannot be
  expressed as mergeable partials.)
- Grouped PAIR GENERATION (LSH buckets etc.) can NOT be salted — a pair
  needs both members in one group; the dedup stages bound those buckets
  via banding parameters and the singleton prefilter instead
  (stages/dedup.py).
- The pyramid compose shuffle needs no salting: groups are bounded at
  4^(levels+coarse) children by construction (stages/compose.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def add_salt(ds, key: str, n_salt: int, id_col: str | None = None):
    """Append a `salt` column: deterministic spread of each key's rows
    over n_salt sub-buckets (hash of a distinguishing column when given,
    else row position within the batch)."""
    from ..geo import _mix32

    def f(batch: pa.Table) -> pa.Table:
        if id_col is not None:
            basis = batch[id_col].to_numpy().astype(np.int64)
        else:
            basis = np.arange(batch.num_rows, dtype=np.int64)
        salt = (_mix32(basis) % np.uint64(n_salt)).astype(np.int64)
        return batch.append_column("salt", pa.array(salt, pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow")


def salted_grouped_aggregate(ds, key: str, aggs_partial, aggs_final,
                             n_salt: int = 16, id_col: str | None = None):
    """Two-phase skew-safe grouped aggregate:
        groupby(key, salt).aggregate(aggs_partial)
          -> groupby(key).aggregate(aggs_final)
    aggs_* are ray.data.aggregate.AggregateFn lists; the partial outputs
    must be mergeable by the final aggregates (Sum/Sum, Min/Min, ...).
    """
    salted = add_salt(ds, key, n_salt, id_col=id_col)
    part = salted.groupby([key, "salt"]).aggregate(*aggs_partial)
    return part.groupby(key).aggregate(*aggs_final)

"""Cluster-size tunables shared across pipelines and stages.

HASH_PARTS sizes the hash-partitioned map_groups stages (events
windows, rank/cumsum/ntile, sequences, as-of/range joins). Results are
partition-invariant; the default suits 32 local CPUs — on a real
cluster size it to ~2-4x the total task slots so no partition outgrows
a worker (FTR_HASH_PARTS env).

JOIN_PARTS sizes the native hash-join fan-out (Dataset.join
num_partitions). Joins run one aggregator ACTOR per partition, so
their sweet spot is lower than map-stage hash fan-out; it scales with
the same FTR_HASH_PARTS knob (64 -> 8 by default) and can be pinned
directly with FTR_JOIN_PARTS.
"""

from __future__ import annotations

import os

HASH_PARTS = int(os.environ.get("FTR_HASH_PARTS", "64"))
JOIN_PARTS = (int(os.environ.get("FTR_JOIN_PARTS", "0"))
              or max(8, HASH_PARTS // 8))

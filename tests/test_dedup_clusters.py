"""Connected-components (near-dup clustering) vs an in-process
union-find reference over the same pair graph, plus a synthetic chain
graph exercising multi-round label propagation."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from freemap_tiler_ray.stages.dedup import connected_components

SF = "/root/testdata/sf0.001"


def _union_find(n_ids, pairs):
    parent = {int(i): int(i) for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-label per component
    return {i: find(i) for i in parent}


def _run(ids, pairs):
    docs = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    pds = rd.from_arrow(pa.table({
        "doc_a": pa.array([p[0] for p in pairs], pa.int64()),
        "doc_b": pa.array([p[1] for p in pairs], pa.int64())}))
    got = connected_components(pds, docs).to_pandas()
    return dict(zip(got["doc_id"].astype(int), got["cluster"].astype(int)))


def test_chain_and_forest(ray_session):
    # a 12-node chain (diameter 11: exercises multiple rounds), a
    # triangle, and isolated nodes
    ids = list(range(20))
    pairs = [(i, i + 1) for i in range(11)] + [(13, 14), (14, 15), (13, 15)]
    got = _run(ids, pairs)
    exp = _union_find(ids, pairs)
    assert got == exp
    assert got[11] == 0 and got[15] == 13 and got[19] == 19


def test_random_graph_matches_union_find(ray_session):
    rng = np.random.default_rng(11)
    ids = list(range(300))
    m = rng.integers(0, 300, size=(150, 2))
    pairs = [(int(min(a, b)), int(max(a, b))) for a, b in m if a != b]
    got = _run(ids, pairs)
    assert got == _union_find(ids, pairs)

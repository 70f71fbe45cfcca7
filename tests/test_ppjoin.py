"""PPJoin prefix-filter candidate COMPLETENESS, independent of the
DuckDB oracle: on randomized synthetic shingle sets, the end-to-end
ppjoin_pairs result must equal the brute-force all-pairs Jaccard
threshold — i.e. the prefix filter (sz - ceil(tau*sz) + 1 head tokens
under the global order) may only shrink the CANDIDATE set, never the
verified result. Randomized overlap structure specifically stresses
pairs sitting exactly at tau (the prefix theorem's tight case)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from freemap_tiler_ray.stages.dedup import PPJOIN_TAU, ppjoin_pairs


def _brute(ids, sets, tau):
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sets[i], sets[j]
            inter = len(a & b)
            if inter and inter / len(a | b) >= tau:
                out.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    return out


def _run(ids, sets):
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "shingles": pa.array([sorted(s) for s in sets],
                             pa.list_(pa.int64()))})
    got = ppjoin_pairs(rd.from_arrow(tbl).repartition(4)).to_pandas()
    return set(zip(got["doc_a"].astype(int), got["doc_b"].astype(int)))


def test_ppjoin_matches_bruteforce_randomized(ray_session):
    rng = np.random.default_rng(7)
    universe = np.arange(200, dtype=np.int64) * 7919 + 13
    ids, sets = [], []
    base = set(int(x) for x in rng.choice(universe, 12, replace=False))
    for i in range(40):
        # families of perturbed copies -> many pairs straddling tau,
        # including exact-tau boundary pairs
        s = set(base)
        n_swap = int(rng.integers(0, 10))
        drop = rng.choice(sorted(s), min(n_swap, len(s) - 2),
                          replace=False)
        s -= set(int(x) for x in drop)
        s |= set(int(x) for x in rng.choice(universe, n_swap,
                                            replace=False))
        ids.append(i)
        sets.append(s)
        if i % 10 == 9:      # fresh family
            base = set(int(x) for x in rng.choice(universe, 12,
                                                  replace=False))
    assert _run(ids, sets) == _brute(ids, sets, PPJOIN_TAU)


def test_ppjoin_exact_tau_boundary(ray_session):
    # |A| = |B| = 4, |A ∩ B| = 2, union 6 -> J = 1/3 < 0.5 (excluded);
    # |A ∩ B| = 3, union 5 -> J = 0.6 >= 0.5 (included); and an
    # identical pair J = 1.0. Also two sets meeting J = 0.5 exactly:
    # |A|=2 |B|=2 inter=... J=1/3; use |A|=3 |B|=3 inter=2 -> J=0.5.
    sets = [
        {10, 20, 30},          # 0
        {10, 20, 40},          # 1: J(0,1) = 2/4 = 0.5 exactly -> kept
        {10, 50, 60, 70},      # 2: J(0,2) = 1/6 -> dropped
        {10, 20, 30},          # 3: J(0,3) = 1.0 -> kept
    ]
    got = _run([0, 1, 2, 3], sets)
    # J(0,1) = J(1,3) = 2/4 = 0.5 exactly -> kept; J(0,3) = 1.0 ->
    # kept; every pair with doc 2 is below tau -> dropped
    assert got == {(0, 1), (0, 3), (1, 3)}

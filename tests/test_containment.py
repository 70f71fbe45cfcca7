"""containment_pairs semantics, independent of the DuckDB oracle: on
randomized synthetic shingle sets — including exact subsets, near
subsets straddling the 80% threshold, and disjoint sets — the
end-to-end result must equal the brute-force containment definition
floor(1e6 * |A∩B| / min(|A|,|B|)) >= CONT_TAU_PPM, with exact integer
n_common / sizes / cont_ppm on every surviving row."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from freemap_tiler_ray.stages.dedup import CONT_TAU_PPM, containment_pairs


def _brute(ids, sets):
    out = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sets[i], sets[j]
            inter = len(a & b)
            mn = min(len(a), len(b))
            if inter and inter * 1_000_000 >= CONT_TAU_PPM * mn:
                k = (min(ids[i], ids[j]), max(ids[i], ids[j]))
                out[k] = (inter, inter * 1_000_000 // mn)
    return out


def _run(ids, sets):
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "shingles": pa.array([sorted(s) for s in sets],
                             pa.list_(pa.int64()))})
    got = containment_pairs(rd.from_arrow(tbl).repartition(4)).to_pandas()
    return {(int(a), int(b)): (int(n), int(p))
            for a, b, n, p in zip(got["doc_a"], got["doc_b"],
                                  got["n_common"], got["cont_ppm"])}


def test_containment_matches_bruteforce(ray_session):
    rng = np.random.default_rng(11)
    universe = np.arange(300, dtype=np.int64) * 104729 + 7
    ids, sets = [], []
    base = set(int(x) for x in rng.choice(universe, 20, replace=False))
    # exact subset (truncation): 100% contained
    ids.append(1); sets.append(set(base))
    ids.append(2); sets.append(set(sorted(base)[:10]))
    # boundary cases around 80%: 8/10 and 7/10 of a 10-subset
    sub = sorted(base)[:10]
    extra = [int(x) for x in universe if int(x) not in base]
    ids.append(3); sets.append(set(sub[:8]) | set(extra[:2]))   # 8/10
    ids.append(4); sets.append(set(sub[:7]) | set(extra[2:5]))  # 7/10
    # random perturbation families
    for i in range(30):
        s = set(int(x) for x in rng.choice(universe,
                                           int(rng.integers(5, 25)),
                                           replace=False))
        if rng.random() < 0.5:
            s |= set(sorted(base)[:int(rng.integers(0, 15))])
        ids.append(10 + i); sets.append(s)
    assert _run(ids, sets) == _brute(ids, sets)
    # sanity: the fixture actually exercises both sides of the threshold
    br = _brute(ids, sets)
    assert (1, 2) in br and br[(1, 2)][1] == 1_000_000
    assert (1, 3) in br      # 8/10 = exactly 800000 ppm survives
    assert (1, 4) not in br  # 7/10 = 700000 ppm is dropped

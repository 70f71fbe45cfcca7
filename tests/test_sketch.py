"""Cardinality sketches: KMV determinism/merge laws, HLL error bound."""

import hashlib

import numpy as np
import pytest

from freemap_tiler_ray.stages.sketch import (HLL_P, KMV_K, hll_estimate,
                                             hll_merge, hll_partial,
                                             kmv_estimate, kmv_merge,
                                             kmv_partial)


def _hexes(vals):
    return np.array([hashlib.md5(str(v).encode()).hexdigest()
                     for v in vals], dtype=object)


def test_kmv_exact_below_k():
    h = _hexes(range(KMV_K - 5))
    part = kmv_partial(h)
    assert len(part) == KMV_K - 5
    assert kmv_estimate(part) == float(KMV_K - 5)


def test_kmv_merge_equals_single_pass():
    h = _hexes(range(1000))
    whole = kmv_partial(h)
    merged = kmv_merge(kmv_partial(h[:300]), kmv_partial(h[300:700]),
                       kmv_partial(h[700:]))
    assert list(whole) == list(merged)


def test_kmv_merge_order_independent_and_duplicate_tolerant():
    h = _hexes(range(500))
    a, b = kmv_partial(h[:250]), kmv_partial(h[250:])
    assert list(kmv_merge(a, b)) == list(kmv_merge(b, a, a))


def test_kmv_estimate_accuracy():
    for n in (500, 5000):
        est = kmv_estimate(kmv_partial(_hexes(range(n))))
        # KMV relative error ~ 1/sqrt(k-1) ~ 12.6% at k=64; allow 4 sigma
        assert abs(est - n) / n < 0.5, (n, est)


def test_kmv_estimate_matches_duckdb_formula():
    import duckdb
    h = sorted(_hexes(range(200)).tolist())
    kth = h[KMV_K - 1]
    sql_est = duckdb.sql(
        f"SELECT CAST({KMV_K - 1} AS DOUBLE) / "
        f"(CAST(CAST(concat('0x', substr('{kth}', 1, 8)) AS UBIGINT) "
        f"AS DOUBLE) / 4294967296.0)").fetchone()[0]
    assert kmv_estimate(np.array(h, dtype=object)) == sql_est


def test_hll_empty():
    regs = hll_partial([])
    assert regs.shape == (1 << HLL_P,) and regs.dtype == np.uint8
    assert hll_estimate(regs) == 0.0


@pytest.mark.parametrize("n", [100, 2000, 50_000])
def test_hll_error_bound(n):
    regs = hll_partial([f"item-{i}" for i in range(n)])
    est = hll_estimate(regs)
    # sigma = 1.04/sqrt(4096) ~ 1.6%; allow 5 sigma
    assert abs(est - n) / n < 0.08, (n, est)


def test_hll_merge_equals_single_pass_and_dedups():
    vals = [f"v{i}" for i in range(10_000)]
    whole = hll_partial(vals)
    merged = hll_merge(hll_partial(vals[:4000]),
                       hll_partial(vals[3000:8000]),   # overlap on purpose
                       hll_partial(vals[8000:]))
    assert np.array_equal(whole, merged)
    assert hll_estimate(merged) == hll_estimate(whole)


def test_hll_insensitive_to_duplicates():
    vals = [f"x{i}" for i in range(1000)]
    once = hll_partial(vals)
    many = hll_partial(vals * 7)
    assert np.array_equal(once, many)


# ---------------------------------------------------------------------------
# CountMin / Misra-Gries
# ---------------------------------------------------------------------------

def test_countmin_never_underestimates_and_is_tight():
    from freemap_tiler_ray.stages.sketch import (cm_merge, cm_partial,
                                                 cm_query)
    rng = np.random.RandomState(7)
    vals = [f"t{int(i)}" for i in rng.zipf(1.5, 20_000) if i < 500]
    n = len(vals)
    tab = cm_merge(cm_partial(vals[:n // 3]), cm_partial(vals[n // 3:]))
    import collections
    exact = collections.Counter(vals)
    items = sorted(exact)
    est = cm_query(tab, items)
    true = np.array([exact[v] for v in items])
    assert (est >= true).all()                      # one-sided guarantee
    assert (est - true).max() <= 3 * np.e / 4096 * n  # 3x the eps bound


def test_countmin_merge_equals_single_pass():
    from freemap_tiler_ray.stages.sketch import cm_merge, cm_partial
    vals = [f"v{i % 97}" for i in range(5000)]
    whole = cm_partial(vals)
    merged = cm_merge(cm_partial(vals[:1234]), cm_partial(vals[1234:]))
    assert np.array_equal(whole, merged)


def test_countmin_weighted_counts():
    from freemap_tiler_ray.stages.sketch import cm_partial, cm_query
    tab = cm_partial(["a", "b"], counts=[10, 3])
    assert cm_query(tab, ["a"])[0] >= 10
    assert cm_query(tab, ["zzz"])[0] <= 13          # <= total stream


def test_misra_gries_heavy_hitters_survive():
    from freemap_tiler_ray.stages.sketch import mg_merge, mg_partial
    k = 16
    # 3 heavy items (>N/k each) + uniform noise
    vals = (["hot1"] * 500 + ["hot2"] * 400 + ["hot3"] * 300
            + [f"noise{i}" for i in range(800)])
    parts = [mg_partial(vals[i::4], k=k) for i in range(4)]
    summary = mg_merge(*parts, k=k)
    n = len(vals)
    assert {"hot1", "hot2", "hot3"} <= set(summary)
    assert len(summary) < k
    # counter error bound: true - N/k <= counter <= true
    assert summary["hot1"] <= 500 and summary["hot1"] >= 500 - n / k


def test_misra_gries_error_bound_random():
    from freemap_tiler_ray.stages.sketch import mg_merge, mg_partial
    import collections
    rng = np.random.RandomState(3)
    vals = [f"z{int(v)}" for v in rng.zipf(1.3, 5000) if v < 200]
    exact = collections.Counter(vals)
    k = 32
    summary = mg_merge(mg_partial(vals[: len(vals) // 2], k=k),
                       mg_partial(vals[len(vals) // 2:], k=k), k=k)
    for v, c in summary.items():
        assert exact[v] - len(vals) / k <= c <= exact[v]


def test_dd_quantile_relative_error_bound():
    from freemap_tiler_ray.stages.sketch import (DD_ALPHA, dd_merge,
                                                 dd_partial, dd_quantile)
    rng = np.random.RandomState(7)
    x = np.exp(rng.normal(0.0, 2.0, 20000))        # heavy-tailed positives
    chunks = np.array_split(x, 13)
    s = dd_merge(*[dd_partial(c) for c in chunks])
    xs = np.sort(x)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99, 0.999):
        true = xs[int(np.ceil(q * (len(x) - 1)))]
        est = dd_quantile(s, q)
        assert abs(est - true) / true <= DD_ALPHA + 1e-12, (q, est, true)


def test_dd_merge_equals_single_pass_and_is_associative():
    from freemap_tiler_ray.stages.sketch import dd_merge, dd_partial
    rng = np.random.RandomState(11)
    x = np.abs(rng.normal(5.0, 3.0, 9000))
    a, b, c = np.array_split(x, 3)
    single = dd_partial(x)
    left = dd_merge(dd_merge(dd_partial(a), dd_partial(b)), dd_partial(c))
    right = dd_merge(dd_partial(a), dd_merge(dd_partial(b), dd_partial(c)))
    assert single == left == right


def test_dd_zero_counter_and_collapse_bound():
    from freemap_tiler_ray.stages.sketch import (dd_merge, dd_partial,
                                                 dd_quantile)
    x = np.concatenate([np.zeros(50), np.exp(np.linspace(-8, 8, 950))])
    s = dd_partial(x)
    assert s["zero"] == 50
    assert dd_quantile(s, 0.01) == 0.0
    # force collapse to 16 bins: upper quantiles keep the bound, and
    # the sketch size is capped
    small = dd_merge(dd_partial(x[:500], max_bins=16),
                     dd_partial(x[500:], max_bins=16), max_bins=16)
    assert len(small["bins"]) <= 16
    xs = np.sort(x)
    true99 = xs[int(np.ceil(0.99 * (len(x) - 1)))]
    est99 = dd_quantile(small, 0.99)
    assert abs(est99 - true99) / true99 <= 0.011


def test_dd_sketch_distributed_over_events(ray_session):
    """The intended 100-TB shape: one fixed-size DD partial per batch
    (map_batches), associative merge of the partial rows, quantiles
    from the merged sketch within the alpha bound of exact."""
    import pickle

    import pyarrow as pa

    from freemap_tiler_ray.sources.pq import read_parquet
    from freemap_tiler_ray.stages.sketch import (DD_ALPHA, dd_merge,
                                                 dd_partial, dd_quantile)

    sf = "/root/testdata/sf0.001"

    def part(t: pa.Table) -> pa.Table:
        s = dd_partial(t["value"].to_numpy())
        return pa.table({"sk": pa.array([pickle.dumps(s)], pa.binary())})

    rows = (read_parquet(f"{sf}/events.parquet", columns=["value"])
            .repartition(8)
            .map_batches(part, batch_format="pyarrow")
            .take_all())
    merged = dd_merge(*[pickle.loads(r["sk"]) for r in rows])

    import pyarrow.parquet as pq
    x = pq.read_table(f"{sf}/events.parquet", columns=["value"]
                      )["value"].to_numpy()
    xs = np.sort(x)
    for q in (0.1, 0.5, 0.9, 0.99):
        true = xs[int(np.ceil(q * (len(x) - 1)))]
        if true == 0.0:
            assert dd_quantile(merged, q) == 0.0
        else:
            assert abs(dd_quantile(merged, q) - true) / true <= DD_ALPHA

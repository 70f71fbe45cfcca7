"""Rotation invariants for the driver's head-50 correctness window.

The round driver checks only the FIRST 50 queries() keys, so the
registry is rotated each round. Two things must hold:

1. the head-50 equals DRIVER_WINDOW exactly (a misordered insert would
   silently ship a query without driver coverage — this is how 6
   round-3 additions missed their round, and how 2 round-4 additions
   fell out of the round-4 rotation plan);
2. every registered query either already has a driver row in some
   CORRECTNESS_r*.json artifact or sits inside the current window —
   derived from the artifacts themselves, NOT from a hand-maintained
   list or a dict-order heuristic (the round-4 heuristic missed
   events_dedup_latest / value_percentiles because they registered
   before the tail marker it keyed on).
"""

import glob
import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry():
    spec = importlib.util.spec_from_file_location(
        "ray_entry_window", os.path.join(REPO, "__ray_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _driver_checked() -> set[str]:
    """Every query name with a driver row in any prior round."""
    seen: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as f:
            seen.update(json.load(f).keys())
    return seen


def test_head_50_matches_driver_window():
    mod = _entry()
    assert len(mod.DRIVER_WINDOW) == 50
    assert len(set(mod.DRIVER_WINDOW)) == 50
    head = list(mod.queries())[:50]
    assert head == list(mod.DRIVER_WINDOW)


def test_every_query_has_an_oracle():
    mod = _entry()
    qs, os_ = mod.queries(), mod.oracle_sql()
    assert sorted(qs) == sorted(os_), (
        "every registered query needs a DuckDB oracle (or an explicit "
        "carve-out documented here)")


def test_no_query_unchecked_for_two_rounds():
    """The mechanical rotation rule: set(queries) - driver-green (from
    the CORRECTNESS artifacts) must be a subset of the current window,
    so nothing ships driver-unchecked two rounds in a row."""
    mod = _entry()
    never = set(mod.queries()) - _driver_checked()
    stranded = never - set(mod.DRIVER_WINDOW)
    assert not stranded, (
        f"queries with no driver row in any round AND outside the "
        f"current window: {sorted(stranded)} — rotate them into "
        f"DRIVER_WINDOW")


# Same-kernel companion shapes: a window slot spent on one of these
# while its partner is already in the head is a wasted re-check (the
# BASELINE.md ordering rule). Upstream halves / aggregates / resumed
# variants of the same kernel; extend when registering new companions.
COMPANIONS = [
    ("knn", "knn_ring"),
    ("doc_points", "doc_cells"),
    ("doc_cells", "cell_counts"),
    ("cell_counts", "resume_cell_counts"),
    ("minhash_sigs", "lsh_pairs"),
    ("simhash_sigs", "simhash_pairs"),
    ("winnow_fp", "winnow_pairs"),
    ("ngram_pairs", "dedup_eval"),
    ("simhash_pairs", "dedup_eval"),
    ("spans_fp", "span_kind_stats"),
]


def test_window_has_no_companion_pairs():
    mod = _entry()
    head = set(mod.DRIVER_WINDOW)
    both = [(a, b) for a, b in COMPANIONS if a in head and b in head]
    assert not both, (
        f"head-50 spends two slots on same-kernel companions: {both} "
        f"— keep the distinct-oracle pipeline in the head and move "
        f"the companion to the tail")


def test_companion_names_are_registered():
    mod = _entry()
    qs = set(mod.queries())
    for a, b in COMPANIONS:
        assert a in qs and b in qs, (a, b)


def test_in_sorted_membership_mask():
    import numpy as np

    from freemap_tiler_ray.pipelines.queries import _in_sorted

    keys = np.array([2, 5, 9], np.int64)
    vals = np.array([1, 2, 5, 6, 9, 10], np.int64)
    assert _in_sorted(keys, vals).tolist() == [
        False, True, True, False, True, False]
    # empty key set -> nothing matches; empty vals -> empty mask
    assert _in_sorted(np.empty(0, np.int64), vals).sum() == 0
    assert _in_sorted(keys, np.empty(0, np.int64)).shape == (0,)

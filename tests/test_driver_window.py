"""Rotation invariant: the first 50 queries() keys must equal
DRIVER_WINDOW exactly — the round driver checks only the head-50, so a
misordered insert would silently ship a query without driver coverage
(this is how 6 round-3 additions missed their round; see VERDICT r3
'Next round' #2)."""

import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _entry():
    spec = importlib.util.spec_from_file_location(
        "ray_entry_window", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__ray_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


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

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


def test_round5_rotation_is_exactly_the_unchecked_tail():
    """ROUND5_ROTATION must equal the set of registered queries that
    have never had a driver row: everything outside BOTH the current
    head-50 window and the r1-r3 cross-round-green set. Keeping this
    exact makes round-5 window rotation mechanical (see the comment at
    the definition site)."""
    mod = _entry()
    qs = list(mod.queries())
    # r1-r3 driver-green: every query registered by round 3 (106) minus
    # the 7 first-checked in the r3 window is r1/r2-green; the r3
    # window covered the rest. Operationally: anything NOT in the
    # current head-50 and NOT in ROUND5_ROTATION must be an r1-r3
    # registration (driver-green in some round).
    rot = set(mod.ROUND5_ROTATION)
    head = set(mod.DRIVER_WINDOW)
    assert not rot & head, "rotation list may not overlap the window"
    assert rot < set(qs), "rotation list must be registered queries"
    # every registry entry after the head-50 that is a round-4 tail or
    # session-IV addition must be in the rotation list: the tail of
    # queries() from 'time_rollup' onward in dict order IS that set,
    # minus the r1-r3-green entries interleaved behind it.
    tail_after_window = [k for k in qs if k not in head]
    r4_tail = [k for k in tail_after_window if k in rot]
    assert sorted(r4_tail) == sorted(rot)

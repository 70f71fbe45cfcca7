"""Block-format lint: a `map_groups(batch_format="pandas")` whose fold
RETURNS a pandas DataFrame emits pandas-format blocks, and a wide op
(groupby/join/aggregate/sort) consuming pandas blocks runs on a
measured ~17x slow path (BASELINE.md round-5: 81.7 s vs 4.8 s for the
same 870k-group aggregate; link_predict paid 237 s for it at sf0.01).

This lint walks every function in pipelines/queries.py and the stages
modules, finds map_groups sites that are FOLLOWED by a wide Dataset op
in the same function, and asserts the fold function's returns build
`pa.table(...)` / `pa.Table...` — unless the site is in the explicit
allowlist of folds whose downstream frames are bounded (constant-size
histograms etc.), where block format cannot matter.
"""

import ast
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FILES = [
    "freemap_tiler_ray/pipelines/queries.py",
    "freemap_tiler_ray/stages/dedup.py",
    "freemap_tiler_ray/stages/ann.py",
    "freemap_tiler_ray/stages/spatial.py",
    "freemap_tiler_ray/stages/salt.py",
    "freemap_tiler_ray/stages/sketch.py",
]

# (enclosing function, fold name): pandas return is FINE because the
# fold's whole output is a bounded frame (constant-size keys), so the
# downstream wide op touches a constant number of rows.
ALLOWLIST = {
    ("q4_order_priority", "lfold"),          # feeds a keys-only join;
                                             # one row per orderkey,
                                             # Arrow join input side
    ("event_markov", "fold"),                # |types|^2-bounded
    ("assoc_rules", "pairs"),                # |types| choose 2 bounded
    ("source_overlap", "pair_partial"),      # |sources|^2-bounded
    ("sorted_neighbor_pairs", "rank_group"),  # rank riders; window-
    ("sorted_neighbor_pairs", "pair_bucket"),  # bounded pair frames
}

WIDE = {"groupby", "join", "sort", "aggregate", "repartition"}


def _returns_arrow(fn: ast.FunctionDef) -> bool:
    """True if every return statement builds an Arrow table (directly,
    or via a local name assigned from pa.table(...))."""
    arrow_names = set()
    for n in ast.walk(fn):
        if isinstance(n, ast.Assign) and isinstance(n.value, ast.Call):
            f = n.value.func
            if isinstance(f, ast.Attribute) and f.attr in ("table", "Table"):
                for tgt in n.targets:
                    if isinstance(tgt, ast.Name):
                        arrow_names.add(tgt.id)
    rets = [n for n in ast.walk(fn) if isinstance(n, ast.Return)]
    if not rets:
        return False
    for r in rets:
        if (isinstance(r.value, ast.Name)
                and r.value.id in arrow_names):
            continue
        ok = False
        for n in ast.walk(r):
            if isinstance(n, ast.Attribute) and n.attr in ("table", "Table"):
                ok = True
        if not ok:
            return False
    return True


def _check_file(relpath: str):
    src = open(os.path.join(REPO, relpath)).read()
    tree = ast.parse(src)
    offenders = []
    for outer in ast.walk(tree):
        if not isinstance(outer, ast.FunctionDef):
            continue
        inner_fns = {n.name: n for n in ast.walk(outer)
                     if isinstance(n, ast.FunctionDef) and n is not outer}
        # map_groups call sites inside this function, with the fold arg
        sites = []
        for n in ast.walk(outer):
            if (isinstance(n, ast.Call)
                    and isinstance(n.func, ast.Attribute)
                    and n.func.attr == "map_groups" and n.args):
                fold = n.args[0]
                fmt = next((kw.value for kw in n.keywords
                            if kw.arg == "batch_format"), None)
                is_pandas = (isinstance(fmt, ast.Constant)
                             and fmt.value == "pandas")
                if isinstance(fold, ast.Name) and is_pandas:
                    # end_lineno of the func attribute = the line the
                    # .map_groups( name itself sits on (Call.lineno is
                    # the START of the whole chain, useless for order)
                    sites.append((n.func.end_lineno, fold.id))
        if not sites:
            continue
        # wide ops AFTER the map_groups site (same enclosing function)
        wide_lines = [n.func.end_lineno for n in ast.walk(outer)
                      if isinstance(n, ast.Call)
                      and isinstance(n.func, ast.Attribute)
                      and n.func.attr in WIDE]
        for lineno, fold_name in sites:
            if not any(wl > lineno for wl in wide_lines):
                continue  # tail fold, nothing wide downstream
            if (outer.name, fold_name) in ALLOWLIST:
                continue
            fn = inner_fns.get(fold_name)
            if fn is None or not _returns_arrow(fn):
                offenders.append(
                    f"{relpath}:{lineno} {outer.name}.{fold_name}")
    return offenders


def test_pandas_folds_feeding_wide_ops_return_arrow():
    offenders = []
    for f in FILES:
        offenders += _check_file(f)
    assert not offenders, (
        "pandas-format map_groups output feeds a wide Dataset op — "
        "return pa.table(...) from the fold (or allowlist it with a "
        "bounded-frame justification): " + ", ".join(offenders))


def test_lint_catches_a_planted_violation(tmp_path):
    """Negative control: a pandas-returning fold feeding a groupby must
    be flagged; the same fold returning pa.table must pass."""
    bad = '''
def q(sf):
    def fold(g):
        return g[["a", "b"]]
    return (ds.groupby("_part").map_groups(fold, batch_format="pandas")
            .groupby(["a", "b"]).aggregate(S))
'''
    good = bad.replace('return g[["a", "b"]]',
                       'return pa.table({"a": g["a"]})')
    global REPO
    for src, expect in ((bad, 1), (good, 0)):
        f = tmp_path / "planted.py"
        f.write_text(src)
        old = REPO
        try:
            REPO = str(tmp_path)
            offenders = _check_file("planted.py")
        finally:
            REPO = old
        assert len(offenders) == expect, (src, offenders)


def test_allowlist_entries_still_exist():
    import re
    found = set()
    for f in FILES:
        src = open(os.path.join(REPO, f)).read()
        tree = ast.parse(src)
        for outer in ast.walk(tree):
            if isinstance(outer, ast.FunctionDef):
                for n in ast.walk(outer):
                    if isinstance(n, ast.FunctionDef) and n is not outer:
                        found.add((outer.name, n.name))
    stale = {a for a in ALLOWLIST if a not in found}
    assert not stale, f"allowlist entries no longer in the code: {stale}"

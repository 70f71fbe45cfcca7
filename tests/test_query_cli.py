"""Subprocess e2e for the query-layer CLI (freemap_tiler_ray.query_cli):
--list enumerates the registry, a Dataset-returning query writes
partitioned parquet, and an unknown name exits 2."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def _run(*argv):
    return subprocess.run(
        [sys.executable, "-m", "freemap_tiler_ray.query_cli", *argv],
        cwd=REPO, capture_output=True, text=True, timeout=600)


def test_list_matches_registry():
    r = _run("--list")
    assert r.returncode == 0
    names = r.stdout.split()
    sys.path.insert(0, REPO)
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ray_entry_qcli", os.path.join(REPO, "__ray_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert names == list(mod.queries())


def test_write_parquet(tmp_path):
    out = str(tmp_path / "out")
    r = _run("salted_type_stats", "--sf-dir", SF, "--out", out,
             "--num-cpus", "4")
    assert r.returncode == 0, r.stderr[-2000:]
    import pyarrow.dataset as pads
    tbl = pads.dataset(out).to_table()
    assert tbl.num_rows == 5
    assert set(tbl.column_names) == {"event_type", "n", "s_milli"}


def test_unknown_query():
    r = _run("no_such_query")
    assert r.returncode == 2

"""Oracle sweep runner: every queries() entry vs its DuckDB oracle at
FTR_TEST_SF (default sf0.01) under one (num_cpus, fan-out-env) config
per invocation. Prints one JSON line {"bad": [...], "n": N}.

Usage (mirrors the recorded BENCH/oracle_sweep_r*.txt protocol):
    FTR_HASH_PARTS=16 python BENCH/oracle_sweep.py 8
    FTR_HASH_PARTS=128 python BENCH/oracle_sweep.py 16
    FTR_HASH_PARTS=64 FTR_JOIN_PARTS=5 python BENCH/oracle_sweep.py 32
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

NCPU = int(sys.argv[1]) if len(sys.argv) > 1 else 32
os.environ.setdefault("FTR_TEST_SF", "/root/testdata/sf0.01")

import ray

ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import test_oracle_compare as oc

bad = []
for name in sorted(oc.ORACLES):
    try:
        got = oc._to_df(oc.QUERIES[name](oc.SF_DIR))
        exp = oc._duck(oc.ORACLES[name])
        oc._compare(name, got, exp)
    except Exception as e:  # noqa: BLE001
        bad.append(f"{name}:{type(e).__name__}")
print(json.dumps({"bad": bad, "n": len(oc.ORACLES)}))
ray.shutdown()

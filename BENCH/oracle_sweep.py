"""Round-5 oracle sweep: every queries() entry vs its DuckDB oracle at
sf0.01 under one (num_cpus, fan-out) config per invocation. Prints one
JSON line {"bad": [...], "n": N}. Mirrors the r4 sweep protocol."""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

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

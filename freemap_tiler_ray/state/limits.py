"""Per-zoom tile-extent limits aggregate (SURVEY.md §2.5 A1).

Mirrors /root/reference/src/processor.rs:569-584 + main.rs:351-364: a
grouped min/max over (x, TMS-flipped y) of every tile WITH DATA — empty
markers do not touch limits (the update sits in the data branch only;
the `else if insert_empty` marker branch at processor.rs:594-601 skips
it). Serialized to the metadata `limits` JSON extension
(README.md:9-16): {zoom: {min_x, max_x, min_y, max_y}}.
"""

from __future__ import annotations

import json

import pyarrow.compute as pc
from ray.data.aggregate import Max, Min


def limits_from_encoded(ds):
    """Encoded-tile dataset (zoom, x, tms_y, status, ...) -> {zoom: limits}."""
    data_only = ds.map_batches(
        lambda t: t.filter(pc.equal(t["status"], "data")),
        batch_format="pyarrow")
    agg = (data_only.groupby("zoom")
             .aggregate(Min("x", alias_name="min_x"), Max("x", alias_name="max_x"),
                        Min("tms_y", alias_name="min_y"), Max("tms_y", alias_name="max_y"))
             .to_pandas())
    return {int(r["zoom"]): {"min_x": int(r["min_x"]), "max_x": int(r["max_x"]),
                             "min_y": int(r["min_y"]), "max_y": int(r["max_y"])}
            for _, r in agg.iterrows()}


import ray


@ray.remote(num_cpus=0)
class LimitsActor:
    """Streaming per-zoom limits collector — the direct Ray analog of the
    reference's Arc<Mutex<HashMap<u8, Limits>>> (processor.rs:35,
    567-584): encode tasks push tiny per-batch partials; the driver reads
    the merged map once per stage and persists it into that stage's
    manifest (so resumed runs recover limits without re-reading tiles)."""

    def __init__(self):
        self.limits: dict[int, dict] = {}

    def update(self, partial: dict) -> None:
        for z, v in partial.items():
            z = int(z)
            cur = self.limits.get(z)
            if cur is None:
                self.limits[z] = dict(v)
            else:
                cur["min_x"] = min(cur["min_x"], v["min_x"])
                cur["max_x"] = max(cur["max_x"], v["max_x"])
                cur["min_y"] = min(cur["min_y"], v["min_y"])
                cur["max_y"] = max(cur["max_y"], v["max_y"])

    def get(self) -> dict:
        return self.limits


def merge_limits(parts: list[dict]) -> dict:
    out: dict[int, dict] = {}
    for p in parts:
        for z, v in p.items():
            z = int(z)
            cur = out.get(z)
            if cur is None:
                out[z] = dict(v)
            else:
                cur["min_x"] = min(cur["min_x"], v["min_x"])
                cur["max_x"] = max(cur["max_x"], v["max_x"])
                cur["min_y"] = min(cur["min_y"], v["min_y"])
                cur["max_y"] = max(cur["max_y"], v["max_y"])
    return out


def partial_limits(zoom, x, tms_y, is_data) -> dict:
    """Vectorized per-batch partial: {zoom: {min_x, max_x, min_y, max_y}}
    over data rows only."""
    import numpy as np

    out = {}
    zoom = np.asarray(zoom)[is_data]
    x = np.asarray(x)[is_data]
    t = np.asarray(tms_y)[is_data]
    for z in np.unique(zoom):
        m = zoom == z
        out[int(z)] = {"min_x": int(x[m].min()), "max_x": int(x[m].max()),
                       "min_y": int(t[m].min()), "max_y": int(t[m].max())}
    return out


def limits_json(limits: dict) -> str:
    """Reference serializes a HashMap<u8, Limits> (main.rs:354); key order
    is unspecified there — we emit ascending zoom for determinism."""
    return json.dumps({str(z): limits[z] for z in sorted(limits)},
                      separators=(",", ":"))

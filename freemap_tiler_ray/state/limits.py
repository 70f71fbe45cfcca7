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


def limits_json(limits: dict) -> str:
    """Reference serializes a HashMap<u8, Limits> (main.rs:354); key order
    is unspecified there — we emit ascending zoom for determinism."""
    return json.dumps({str(z): limits[z] for z in sorted(limits)},
                      separators=(",", ":"))

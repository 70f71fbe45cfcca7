"""CSV/JSONL source shims: roundtrip the events table through each
format and assert value-identical Arrow batches vs the parquet read
(schema metadata stripped in all three paths)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from freemap_tiler_ray.sources.tabular import read_csv, read_jsonl

SF = "/root/testdata/sf0.001"


def _events_subset():
    return pq.read_table(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "value", "props"])


def test_jsonl_roundtrip(ray_session, tmp_path):
    t = _events_subset()
    p = str(tmp_path / "events.jsonl")
    with open(p, "w") as f:
        import json
        for row in t.to_pylist():
            f.write(json.dumps(row) + "\n")
    got = read_jsonl(p).take_all()
    want = t.to_pylist()
    assert sorted(got, key=lambda r: r["event_id"]) == \
        sorted(want, key=lambda r: r["event_id"])


def test_csv_roundtrip(ray_session, tmp_path):
    t = _events_subset().select(["event_id", "user_id", "value"])
    p = str(tmp_path / "events.csv")
    import csv
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(t.column_names)
        for row in t.to_pylist():
            w.writerow([row[c] for c in t.column_names])
    ds = read_csv(p, columns=["event_id", "value"])
    got = ds.take_all()
    b = ds.take_batch(5, batch_format="pyarrow")
    assert b.schema.metadata is None
    want = {r["event_id"]: r["value"] for r in t.to_pylist()}
    assert len(got) == len(want)
    for r in got:
        assert abs(r["value"] - want[r["event_id"]]) < 1e-12

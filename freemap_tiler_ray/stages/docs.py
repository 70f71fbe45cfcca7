"""Interleaved-document (spans) table construction + invariant checking.

The north-rule input shape (BASELINE.json input_hint) is
  (doc_id, spans: list<struct<kind, text, media_ref, offset:int32>>).
The driver testdata's `documents` table is flat, so the spans column is
derived deterministically from doc_id (FIXTURES.md F1):
  row i has 1 + (i % 7) spans; span j:
    kind      = ["text","image","audio"][(i + j) % 3]
    text      = f"t-{i}-{j}"   if kind == "text" else ""
    media_ref = f"m://{i}/{j}" if kind != "text" else ""
    offset    = j * 16
The DuckDB oracle re-derives the identical table in SQL, which is what
makes the per-row span-sequence invariant (kind, text, media_ref, order
— preserved through every stage) externally checkable.

All construction is vectorized over the flattened span arrays; the spans
column is built as a pyarrow ListArray (Arrow end-to-end — list columns
do not round-trip pandas safely, see ray_guide pitfalls).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_KINDS = np.array(["text", "image", "audio"])


def _flat_spans(doc_ids: np.ndarray):
    """-> (offsets int32[n+1], i_rep, j_flat) for the flattened span list."""
    n_spans = 1 + (doc_ids % 7)
    offsets = np.zeros(len(doc_ids) + 1, np.int32)
    np.cumsum(n_spans, out=offsets[1:])
    i_rep = np.repeat(doc_ids, n_spans)
    j_flat = np.arange(offsets[-1], dtype=np.int64) - np.repeat(offsets[:-1], n_spans)
    return offsets, i_rep, j_flat


def spans_struct_arrays(i_rep: np.ndarray, j_flat: np.ndarray):
    kind = _KINDS[(i_rep + j_flat) % 3]
    i_s = i_rep.astype(str)
    j_s = j_flat.astype(str)
    text = np.char.add(np.char.add(np.char.add("t-", i_s), "-"), j_s)
    media = np.char.add(np.char.add(np.char.add("m://", i_s), "/"), j_s)
    is_text = kind == "text"
    text = np.where(is_text, text, "")
    media = np.where(is_text, "", media)
    return (pa.array(kind), pa.array(text), pa.array(media),
            pa.array((j_flat * 16).astype(np.int32)))


def build_spans(batch: pa.Table) -> pa.Table:
    """documents batch (needs doc_id) -> (doc_id, spans) batch."""
    doc_ids = batch["doc_id"].to_numpy()
    offsets, i_rep, j_flat = _flat_spans(doc_ids)
    kind, text, media, off = spans_struct_arrays(i_rep, j_flat)
    struct = pa.StructArray.from_arrays([kind, text, media, off],
                                        ["kind", "text", "media_ref", "offset"])
    spans = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)
    return pa.table({"doc_id": batch["doc_id"], "spans": spans})


def check_span_invariant(batch: pa.Table) -> pa.Table:
    """Verify the span-sequence invariant against the deterministic
    derivation; raises on any violation. Returns the batch unchanged, so
    it can be dropped anywhere into a pipeline as a guard stage."""
    doc_ids = batch["doc_id"].to_numpy()
    expected = build_spans(pa.table({"doc_id": batch["doc_id"]}))
    got = batch["spans"]
    if isinstance(got, pa.ChunkedArray):
        got = got.combine_chunks()
    if not got.equals(expected["spans"].combine_chunks()):
        bad = [int(doc_ids[i]) for i in range(len(doc_ids))
               if got.slice(i, 1) != expected["spans"].combine_chunks().slice(i, 1)]
        raise AssertionError(f"span-sequence invariant violated for docs {bad[:10]}")
    return batch


def spans_fingerprint(batch: pa.Table) -> pa.Table:
    """(doc_id, spans) -> (doc_id, n_spans, spans_fp) where spans_fp is the
    order-preserving canonical string 'kind:text:media_ref:offset|...'.
    SQL mirror: string_agg over UNNEST ORDER BY span index."""
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    offsets = spans.offsets.to_numpy()
    flat = spans.flatten()
    kind = flat.field("kind").to_numpy(zero_copy_only=False).astype(str)
    text = flat.field("text").to_numpy(zero_copy_only=False).astype(str)
    media = flat.field("media_ref").to_numpy(zero_copy_only=False).astype(str)
    off = flat.field("offset").to_numpy().astype(str)
    parts = np.char.add(np.char.add(np.char.add(np.char.add(np.char.add(
        np.char.add(kind, ":"), text), ":"), media), ":"), off)
    fps = ["|".join(parts[offsets[i]:offsets[i + 1]])
           for i in range(len(offsets) - 1)]
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_spans": pa.array((offsets[1:] - offsets[:-1]).astype(np.int64)),
        "spans_fp": pa.array(fps, pa.string()),
    })

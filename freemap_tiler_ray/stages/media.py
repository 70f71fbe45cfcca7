"""Multimodal (image/audio/video) column stages.

Media payloads are opaque binary columns with typed metadata. The
sandbox has no image/audio codecs (no PIL / imagecodecs / ffmpeg), so
the decode itself is STUBBED: `MediaDecodeStub` produces deterministic
fake features + payload bytes, while every piece of Ray-side plumbing —
spans flat-map expansion, actor signature, vectorized feature math,
binary payload column layout, batch sizing — is real and tested.
`RealMediaDecode` shows where a real codec plugs in and raises
NotImplementedError until one is importable.

Fake feature derivation is integer-only (geo._mix32 over doc_id/span
index) so the DuckDB oracle can mirror it exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo import _mix32
from .docs import _flat_spans, spans_struct_arrays


class MediaDecodeStub:
    """(doc_id, spans) -> one row per non-text span with fake decoded
    metadata: width/height from a deterministic integer hash, payload =
    that many pseudo-bytes (size-capped). Use as an actor-pool stage:
    map_batches(MediaDecodeStub, concurrency=N, batch_size=small) when
    payloads are large."""

    def __init__(self, payload: bool = False, payload_cap: int = 4096):
        self.payload = payload
        self.cap = payload_cap

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy()
        _, i_rep, j_flat = _flat_spans(doc_ids)
        kind, _, media, _ = spans_struct_arrays(i_rep, j_flat)
        kind = np.asarray(kind)
        is_media = kind != "text"
        ids = i_rep[is_media]
        js = j_flat[is_media]
        refs = np.asarray(media)[is_media]
        h = _mix32(ids * np.int64(31) + js)  # _mix32 masks to 32 bits
        width = (16 + (h % np.uint64(4096))).astype(np.int64)
        height = (16 + ((h >> np.uint64(12)) % np.uint64(4096))).astype(np.int64)
        cols = {
            "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
            "span_idx": pa.array(js.astype(np.int64), pa.int64()),
            "media_ref": pa.array(refs.tolist(), pa.string()),
            "width": pa.array(width, pa.int64()),
            "height": pa.array(height, pa.int64()),
        }
        if self.payload:
            payloads = [bytes((np.arange(min(int(w * hgt), self.cap),
                                         dtype=np.int64) * int(hv) % 256)
                              .astype(np.uint8))
                        for w, hgt, hv in zip(width, height, h)]
            cols["payload"] = pa.array(payloads, pa.binary())
        return pa.table(cols)


class RealMediaDecode:
    """Where a real codec would plug in (kept as a clearly-marked stub;
    mirrors the actor signature of MediaDecodeStub)."""

    def __init__(self):
        try:
            import PIL.Image  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "real media decode requires an image codec (PIL/imagecodecs); "
                "none is available in this environment — use MediaDecodeStub"
            ) from e

    def __call__(self, batch: pa.Table) -> pa.Table:  # pragma: no cover
        raise NotImplementedError

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


class MediaResizeStub:
    """Resize stage plumbing: consumes (doc_id, span_idx, width, height,
    payload) rows from MediaDecodeStub(payload=True), emits deterministic
    'resized' payloads at the target box (aspect-preserving dims math is
    real; the pixel work is the stub). Actor-pool stage: use small
    batch_size when payloads are large."""

    def __init__(self, max_side: int = 64):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy().astype(np.float64)
        h = batch["height"].to_numpy().astype(np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(w, h))
        nw = np.maximum(1, np.floor(w * scale)).astype(np.int64)
        nh = np.maximum(1, np.floor(h * scale)).astype(np.int64)
        payloads = [bytes((np.arange(int(a * b), dtype=np.int64) % 256)
                          .astype(np.uint8))
                    for a, b in zip(nw, nh)]
        return pa.table({
            "doc_id": batch["doc_id"], "span_idx": batch["span_idx"],
            "out_width": pa.array(nw, pa.int64()),
            "out_height": pa.array(nh, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        })


class FrameSampleStub:
    """Frame sampling for audio/video spans: span (doc_id, j) of kind
    'audio' yields 1 + (mix32(doc_id*31+j) % 4) frames at 250 ms spacing
    (deterministic; SQL-mirrorable — the Ray-side flat-map expansion and
    schema are the real part)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy()
        _, i_rep, j_flat = _flat_spans(doc_ids)
        kind, _, media, _ = spans_struct_arrays(i_rep, j_flat)
        is_audio = np.asarray(kind) == "audio"
        ids = i_rep[is_audio]
        js = j_flat[is_audio]
        h = _mix32(ids * np.int64(31) + js)
        n_frames = (1 + (h % np.uint64(4))).astype(np.int64)
        rep_ids = np.repeat(ids.astype(np.int64), n_frames)
        rep_js = np.repeat(js.astype(np.int64), n_frames)
        total = int(n_frames.sum())
        offs = np.zeros(len(n_frames) + 1, np.int64)
        np.cumsum(n_frames, out=offs[1:])
        frame = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], n_frames)
        return pa.table({
            "doc_id": pa.array(rep_ids, pa.int64()),
            "span_idx": pa.array(rep_js, pa.int64()),
            "frame": pa.array(frame, pa.int64()),
            "offset_ms": pa.array(frame * 250, pa.int64()),
        })


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

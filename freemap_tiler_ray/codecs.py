"""Tile image + alpha codecs, pure stdlib (zlib) + numpy.

Mirrors the reference's encode stage semantics
(/root/reference/src/processor.rs:496-562):
  - PNG: CompressionType::Best + Adaptive filtering, La8 (2-band) or
    Rgba8 (4-band)  -> here: zlib level 9, per-row adaptive filter over
    ALL FIVE filters (None/Sub/Up/Average/Paeth, the image-png crate's
    Adaptive set) by the minimum-sum-of-absolute-differences heuristic.
    Byte-identical PNG across encoders is not guaranteed (SURVEY.md §7.5)
    — correctness is defined on DECODED pixels.
  - JPEG + alpha split: color planes JPEG-encoded, alpha plane compressed
    separately (zstd level 0 = library default in the reference,
    processor.rs:518); `fully_opaque` (all alpha == 255) skips the alpha
    blob entirely (processor.rs:505-517). The sandbox has no JPEG codec:
    JPEG is provided by the pure-numpy baseline codec in `jpeg.py`.
    Alpha compression is REAL zstd (byte-compatible with the reference's
    tileserver alpha extension): pyarrow bundles a zstd codec
    (`pyarrow.Codec("zstd")`), with `zstandard` preferred when importable
    and a magic-tagged zlib stream as the last-resort fallback.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:  # optional, absent in this sandbox
    import zstandard as _zstd
except ImportError:  # pragma: no cover
    _zstd = None

try:  # pyarrow ships a bundled zstd codec — real zstd frames
    import pyarrow as _pa
    _pa_zstd = _pa.Codec("zstd", compression_level=3)
except Exception:  # pragma: no cover
    _pa_zstd = None

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload)))


def png_encode(img: np.ndarray) -> bytes:
    """img: (H, W, C) uint8 with C in {1, 2, 3, 4} -> PNG bytes."""
    img = np.ascontiguousarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = img.reshape(h, w * c)
    prev = np.vstack([np.zeros((1, w * c), np.uint8), raw[:-1]])
    left = np.zeros_like(raw)
    left[:, c:] = raw[:, :-c]
    upleft = np.zeros_like(prev)
    upleft[:, c:] = prev[:, :-c]
    # predictors use RAW neighbor values (PNG spec), so every candidate
    # row vectorizes from raw/prev/left/upleft directly
    a16 = left.astype(np.int16)
    b16 = prev.astype(np.int16)
    c16 = upleft.astype(np.int16)
    avg = ((a16 + b16) // 2).astype(np.uint8)
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    paeth = np.where((pa <= pb) & (pa <= pc), a16,
                     np.where(pb <= pc, b16, c16)).astype(np.uint8)
    cands = np.stack([raw, raw - left, raw - prev,         # None, Sub, Up
                      raw - avg, raw - paeth])             # Average, Paeth
    folded = np.minimum(cands, 256 - cands.astype(np.int16)).astype(np.int64)
    choice = folded.sum(axis=2).argmin(axis=0)             # per-row filter id
    filtered = np.take_along_axis(cands, choice[None, :, None], axis=0)[0]
    scan = np.empty((h, 1 + w * c), np.uint8)
    scan[:, 0] = choice
    scan[:, 1:] = filtered
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(scan.tobytes(), 9)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8. Supports 8-bit gray/GA/RGB/RGBA,
    filters 0-4, no interlace (everything our encoder and tests emit)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, meta = 8, [], None
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            meta = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    w, h, bit, color_type, _, _, interlace = meta
    if bit != 8 or interlace != 0:
        raise NotImplementedError("only 8-bit non-interlaced PNG")
    c = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    raw = raw.reshape(h, 1 + w * c)
    filters, rows = raw[:, 0], raw[:, 1:]
    out = np.zeros((h, w * c), np.uint8)
    prev = np.zeros(w * c, np.uint8)
    for r in range(h):
        f, row = int(filters[r]), rows[r].copy()
        if f == 0:
            cur = row
        elif f == 1:
            cur = np.add.accumulate(row.reshape(w, c), axis=0,
                                    dtype=np.uint8).reshape(-1)
        elif f == 2:
            cur = row + prev
        elif f in (3, 4):
            # sequential only in x (left neighbor is reconstructed);
            # vectorized across channels per pixel
            rw = row.reshape(w, c).astype(np.int16)
            pr = prev.reshape(w, c).astype(np.int16)
            rec = np.zeros((w, c), np.int16)
            a = np.zeros(c, np.int16)
            zc = np.zeros(c, np.int16)
            for x in range(w):
                b = pr[x]
                cc = pr[x - 1] if x >= 1 else zc
                if f == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - cc
                    pa = np.abs(p - a)
                    pb = np.abs(p - b)
                    pc = np.abs(p - cc)
                    pred = np.where((pa <= pb) & (pa <= pc), a,
                                    np.where(pb <= pc, b, cc))
                a = (rw[x] + pred) & 0xFF
                rec[x] = a
            cur = rec.astype(np.uint8).reshape(-1)
        else:
            raise ValueError(f"bad filter {f}")
        out[r] = cur
        prev = out[r]
    return out.reshape(h, w, c)


# ---------------------------------------------------------------------------
# Alpha-plane compression (reference: zstd level 0, processor.rs:518)
# ---------------------------------------------------------------------------

_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"


def compress_alpha(alpha_plane: bytes) -> bytes:
    if _zstd is not None:
        return _zstd.ZstdCompressor(level=3).compress(alpha_plane)
    if _pa_zstd is not None:
        return _pa_zstd.compress(alpha_plane, asbytes=True)
    return zlib.compress(alpha_plane, 6)  # pragma: no cover


def decompress_alpha(blob: bytes, size: int) -> np.ndarray:
    """Empty blob = fully opaque (reference processor.rs:203-210)."""
    if len(blob) == 0:
        return np.full(size, 255, np.uint8)
    if blob[:4] == _ZSTD_MAGIC:
        if _zstd is not None:
            raw = _zstd.ZstdDecompressor().decompress(
                blob, max_output_size=size)
        elif _pa_zstd is not None:
            raw = _pa_zstd.decompress(blob, decompressed_size=size,
                                      asbytes=True)
        else:  # pragma: no cover
            raise RuntimeError("zstd blob but no zstd codec importable")
    else:
        raw = zlib.decompress(blob)
    return np.frombuffer(raw, np.uint8)


# ---------------------------------------------------------------------------
# Tile encode / decode dispatch (format: "png" | "jpeg")
# ---------------------------------------------------------------------------

def encode_tile(buf: np.ndarray, fmt: str, quality: int = 85):
    """(H, W, bands-with-alpha) uint8 -> (tile_data, tile_alpha) bytes.

    PNG keeps alpha inside tile_data (tile_alpha empty) — the reference's
    PNG path has no tile_alpha column at all (schema.rs:29-32).
    JPEG splits color planes from alpha; fully-opaque tiles skip the alpha
    blob (processor.rs:505-517).
    """
    if fmt == "png":
        return png_encode(buf), b""
    if fmt == "jpeg":
        from . import jpeg
        color, alpha = buf[:, :, :-1], buf[:, :, -1]
        data = jpeg.jpeg_encode(color, quality)
        if bool((alpha == 255).all()):
            return data, b""
        return data, compress_alpha(alpha.tobytes())
    raise ValueError(f"unknown tile format {fmt!r}")


def decode_tile(tile_data: bytes, tile_alpha: bytes, fmt: str,
                tile_size: int) -> np.ndarray:
    """Inverse of encode_tile, for the resume path (reference
    processor.rs:194-221): returns (ts, ts, bands-with-alpha) uint8."""
    if fmt == "png":
        return png_decode(tile_data)
    from . import jpeg
    color = jpeg.jpeg_decode(tile_data)
    alpha = decompress_alpha(tile_alpha, tile_size * tile_size)
    return np.dstack([color, alpha.reshape(tile_size, tile_size)])

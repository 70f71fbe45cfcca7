"""Separable Lanczos3 / bilinear resampling in pure numpy.

Replaces two kernels of the reference:
  - compose downsample: Rust `image` crate `FilterType::Lanczos3` resize
    of the 2ts x 2ts child mosaic to ts x ts
    (/root/reference/src/processor.rs:278-309);
  - warp resampling: GDAL `GRA_Lanczos` during reprojection
    (/root/reference/src/warp.rs:70).

Semantics mirrored from the `image` crate's sampling model: for a
downscale ratio r = src/dst > 1 the kernel is stretched by r (support 3r
source pixels), tap weights are normalized to sum 1, out-of-range tap
indices clamp to the edge (replicate), channels are resampled
independently (no alpha premultiply — matching the reference, which
resizes RGBA / LumaA u8 buffers directly), intermediates stay float, and
the final u8 conversion rounds then clamps to [0, 255].

Implementation is tap-gather, not dense matmul: each output sample sums
~ceil(6*scale)+2 taps, so cost is O(out * taps), which is what lets a
2048^2 megatile warp run in ~100 ms and the 2:1 compose downsample (a
translation-invariant 12-tap stride-2 convolution) in a few ms.
"""

from __future__ import annotations

import functools

import numpy as np

_LANCZOS_A = 3.0


def lanczos3_kernel(x):
    """L(x) = sinc(x) * sinc(x/3) for |x| < 3, else 0."""
    x = np.asarray(x, dtype=np.float64)
    out = np.sinc(x) * np.sinc(x / _LANCZOS_A)
    return np.where(np.abs(x) < _LANCZOS_A, out, 0.0)


def _bilinear_kernel(x):
    x = np.abs(np.asarray(x, dtype=np.float64))
    return np.where(x < 1.0, 1.0 - x, 0.0)


_KERNELS = {"lanczos3": (lanczos3_kernel, _LANCZOS_A),
            "bilinear": (_bilinear_kernel, 1.0)}


def _axis_taps(src_size, centers, scale, kernel="lanczos3", edge="clamp"):
    """Tap indices + weights for one axis.

    centers: source-space sample coords (pixel-center convention: source
    pixel p covers [p, p+1), center p+0.5). scale: kernel stretch,
    clamped to >= 1. edge="clamp": out-of-range taps replicate the edge
    pixel (image-crate resize semantics). edge="zero": out-of-range taps
    contribute nothing and weights renormalize over in-range taps;
    samples whose center is outside [0, src_size] get all-zero weights
    (warp: outside source -> transparent, GDAL-nodata-like).

    Returns (idx (n, t) int64, w (n, t) float32).
    """
    kfn, support = _KERNELS[kernel]
    centers = np.asarray(centers, dtype=np.float64)
    scale = max(float(scale), 1.0)
    rad = support * scale
    # valid taps t satisfy |t + 0.5 - center| < rad; pad by one each side
    # (extra taps get zero weight)
    left = np.floor(centers - rad - 0.5).astype(np.int64)
    n_tap = int(np.ceil(2.0 * rad)) + 2
    taps = left[:, None] + np.arange(n_tap)[None, :]
    w = kfn((taps + 0.5 - centers[:, None]) / scale)
    if edge == "zero":
        w = np.where((taps >= 0) & (taps < src_size), w, 0.0)
    sums = w.sum(axis=1, keepdims=True)
    sums[sums == 0.0] = 1.0
    w = w / sums
    if edge == "zero":
        w[(centers < 0.0) | (centers > src_size)] = 0.0
    return np.clip(taps, 0, src_size - 1), w.astype(np.float32)


def _apply_axis0(img, idx, w):
    """Resample axis 0 of contiguous img (src, M) -> (len(idx), M).
    uint8 input stays uint8 through the gather (1/4 the DRAM read
    traffic of a pre-converted float source) and is promoted per term —
    bit-identical to converting up front, since u8->f32 is exact."""
    out = np.zeros((idx.shape[0], img.shape[1]), dtype=np.float32)
    if img.dtype == np.uint8:
        bu = np.empty(out.shape, np.uint8)
        ft = np.empty_like(out)
        for t in range(idx.shape[1]):
            np.take(img, idx[:, t], axis=0, out=bu)
            np.multiply(bu, w[:, t][:, None], out=ft)
            out += ft
        return out
    buf = np.empty_like(out)
    for t in range(idx.shape[1]):
        np.take(img, idx[:, t], axis=0, out=buf)
        buf *= w[:, t][:, None]
        out += buf
    return out


def _resample2d(img, idx_x, w_x, idx_y, w_y):
    """img (H, W, C) -> (len(idx_y), len(idx_x), C) float32; vertical pass
    first, then horizontal — the image crate's resize order."""
    h, w, c = img.shape
    f = np.ascontiguousarray(img.reshape(h, w * c), dtype=np.float32)
    tmp = _apply_axis0(f, idx_y, w_y).reshape(-1, w, c)     # (outH, W, C)
    tmp = np.ascontiguousarray(np.moveaxis(tmp, 1, 0)).reshape(w, -1)
    out = _apply_axis0(tmp, idx_x, w_x).reshape(-1, idx_y.shape[0], c)
    return np.moveaxis(out, 1, 0)


def _to_u8(arr):
    return np.clip(np.rint(arr), 0.0, 255.0).astype(np.uint8)


def resize(img, out_h, out_w, kernel="lanczos3"):
    """Resize HxWxC (or HxW) uint8 -> (out_h, out_w[, C]) uint8 with
    pixel-center mapping center_i = (i + 0.5) * ratio."""
    img = np.asarray(img)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    h, w, _ = img.shape
    ry, rx = h / out_h, w / out_w
    idx_y, w_y = _axis_taps(h, (np.arange(out_h) + 0.5) * ry, ry, kernel)
    idx_x, w_x = _axis_taps(w, (np.arange(out_w) + 0.5) * rx, rx, kernel)
    out = _to_u8(_resample2d(img, idx_x, w_x, idx_y, w_y))
    return out[:, :, 0] if squeeze else out


@functools.lru_cache(maxsize=8)
def _down2_taps(kernel):
    """The 2:1 downsample is translation-invariant: center = 2i + 1,
    taps 2i + k for k in [-5, 6], weights independent of i."""
    kfn, support = _KERNELS[kernel]
    rad = support * 2.0
    offs = np.arange(int(np.floor(1 - rad)), int(np.ceil(rad)) + 1)
    w = kfn((offs - 0.5) / 2.0)
    return offs, (w / w.sum()).astype(np.float32)


def downsample2x(img, kernel="lanczos3"):
    """Exact 2:1 resize((H,W,C) -> (H/2, W/2, C)) — the compose path's
    hot kernel (processor.rs:278-309). Identical output to resize() but
    via a stride-2 separable convolution with edge replication."""
    img = np.asarray(img)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    offs, w = _down2_taps(kernel)
    pad_l, pad_r = int(-offs[0]), int(offs[-1])

    def pass0(a):  # downsample axis 0 (uint8 or float32 input; uint8
        # slices promote per term — exact, and 1/4 the read traffic)
        p = np.concatenate([a[:1]] * pad_l + [a] + [a[-1:]] * (pad_r - 1))
        out = np.zeros((a.shape[0] // 2,) + a.shape[1:], np.float32)
        for k in range(len(offs)):
            out += w[k] * p[k:k + a.shape[0]:2]
        return out

    out = pass0(img)
    out = np.moveaxis(pass0(np.moveaxis(out, 1, 0)), 1, 0)
    out = _to_u8(out)
    return out[:, :, 0] if squeeze else out


def downsample2x_batch(arr, kernel="lanczos3"):
    """Batched 2:1 downsample: (G, H, W, C) uint8 -> (G, H/2, W/2, C).
    Identical per-item output to downsample2x(); batching amortizes the
    numpy dispatch overhead across a whole compose group. The group axis
    is processed in cache-sized chunks: the 12-tap accumulation makes
    ~25 passes over its working set, so keeping that set ~two groups of
    a 512-pixel mosaic (~10 MB) instead of the whole batch (500+ MB at
    scale) turns DRAM round-trips into L2/L3 hits — measured ~1.4x on
    the compose-dominant chunk shape."""
    arr = np.asarray(arr)
    g, h, w0, c = arr.shape
    per_group = h * w0 * c * 5          # padded u8 + f32 accumulators
    gc = max(1, (12 << 20) // max(per_group, 1))
    if g > gc:
        return np.concatenate(
            [downsample2x_batch(arr[i:i + gc], kernel)
             for i in range(0, g, gc)])
    offs, wts = _down2_taps(kernel)
    pad_l, pad_r = int(-offs[0]), int(offs[-1])

    def pass_axis1(a):  # (G, H, W, C) -> (G, H/2, W, C); uint8 first
        # pass promotes per term (exact, 1/4 the read traffic)
        p = np.concatenate([a[:, :1]] * pad_l + [a]
                           + [a[:, -1:]] * (pad_r - 1), axis=1)
        out = np.zeros((a.shape[0], a.shape[1] // 2) + a.shape[2:], np.float32)
        for k in range(len(offs)):
            out += wts[k] * p[:, k:k + a.shape[1]:2]
        return out

    out = pass_axis1(arr)
    out = pass_axis1(out.transpose(0, 2, 1, 3)).transpose(0, 2, 1, 3)
    return _to_u8(out)


def grid_warp(img, col, row, scale_x, scale_y, kernel="lanczos3"):
    """Warp with a FULL dst->src coordinate grid — the fallback for
    non-axis-separable transforms (arbitrary pipeline CRS, rotations),
    where separable_warp's 1-D tap factorization does not apply. The
    Lanczos kernel itself is still separable per sample, so each output
    pixel sums an (n_tap_y x n_tap_x) window with product weights;
    out-of-range taps contribute nothing and weights renormalize
    (edge="zero" semantics, matching separable_warp); samples whose
    center falls outside the source come out zero (-> transparent).

    img: (H, W[, C]) uint8; col/row: (outH, outW) fractional source
    coords; scale_*: local src/dst pixel-size ratio (kernel stretch)."""
    img = np.asarray(img)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    h, w, c = img.shape
    kfn, support = _KERNELS[kernel]
    sx, sy = max(float(scale_x), 1.0), max(float(scale_y), 1.0)
    radx, rady = support * sx, support * sy
    ntx = int(np.ceil(2.0 * radx)) + 2
    nty = int(np.ceil(2.0 * rady)) + 2
    leftx = np.floor(col - radx - 0.5).astype(np.int64)
    topy = np.floor(row - rady - 0.5).astype(np.int64)
    acc = np.zeros(col.shape + (c,), np.float32)
    wsum = np.zeros(col.shape, np.float32)
    for ty in range(nty):
        tr = topy + ty
        wy = kfn((tr + 0.5 - row) / sy)
        vr = (tr >= 0) & (tr < h)
        trc = np.clip(tr, 0, h - 1)
        for tx in range(ntx):
            tc = leftx + tx
            wx = kfn((tc + 0.5 - col) / sx)
            wgt = np.where(vr & (tc >= 0) & (tc < w),
                           (wx * wy), 0.0).astype(np.float32)
            acc += wgt[:, :, None] * img[trc, np.clip(tc, 0, w - 1)]
            wsum += wgt
    wsum[wsum == 0.0] = 1.0
    out = acc / wsum[:, :, None]
    out[(col < 0.0) | (col > w) | (row < 0.0) | (row > h)] = 0.0
    out = _to_u8(out)
    return out[:, :, 0] if squeeze else out


def separable_warp(img, src_x_centers, src_y_centers, scale_x, scale_y,
                   kernel="lanczos3"):
    """Warp via independent per-axis resampling (valid whenever the
    dst->src mapping is axis-separable, which holds for 4326<->3857 and
    any axis-aligned affine — SURVEY.md §2.2 T6). Samples whose center
    falls outside the source extent come out zero in every band
    (-> transparent).

    img: (H, W[, C]) uint8; src_*_centers: fractional source pixel coords
    for each dst column / row; scale_*: local src/dst pixel-size ratio.
    """
    img = np.asarray(img)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    h, w, c = img.shape
    out_h, out_w = len(src_y_centers), len(src_x_centers)
    idx_y, w_y = _axis_taps(h, src_y_centers, scale_y, kernel, edge="zero")
    idx_x, w_x = _axis_taps(w, src_x_centers, scale_x, kernel, edge="zero")
    # Stripe-wise evaluation: both passes AND the u8->f32 source
    # conversion run on a ~few-MB working set, so neither the float
    # source nor the intermediate ever round-trips DRAM (a monolithic
    # two-pass warp moves GBs per megatile and saturates single-node
    # memory bandwidth — the stage must stay compute-bound to scale).
    flat = img.reshape(h, w * c)
    out = np.empty((out_h, out_w, c), np.uint8)
    stripe = max(16, (1 << 21) // max(1, w * c * 4))   # ~2 MB of rows
    for s0 in range(0, out_h, stripe):
        s1 = min(out_h, s0 + stripe)
        iy = idx_y[s0:s1]
        r0 = int(iy.min())
        r1 = int(iy.max()) + 1
        src = np.ascontiguousarray(flat[r0:r1])        # u8 stripe (1/4
        vt = _apply_axis0(src, iy - r0, w_y[s0:s1])    # the f32 traffic)
        vt = np.ascontiguousarray(
            np.moveaxis(vt.reshape(s1 - s0, w, c), 1, 0)).reshape(w, -1)
        hz = _apply_axis0(vt, idx_x, w_x).reshape(out_w, s1 - s0, c)
        out[s0:s1] = _to_u8(np.moveaxis(hz, 1, 0))
    return out[:, :, 0] if squeeze else out

"""Separable Lanczos3 / bilinear resampling in pure numpy.

Replaces two kernels of the reference:
  - compose downsample: Rust `image` crate `FilterType::Lanczos3` resize
    of the 2ts x 2ts child mosaic to ts x ts
    (/root/reference/src/processor.rs:278-309);
  - warp resampling: GDAL `GRA_Lanczos` during reprojection
    (/root/reference/src/warp.rs:70).

Semantics mirrored from the `image` crate's sampling model: for a
downscale ratio r = src/dst > 1 the kernel is stretched by r (support
3r source pixels), weights are normalized to sum 1, channels are
resampled independently (no alpha premultiply — matching the reference,
which resizes RGBA / LumaA u8 buffers directly), intermediate values are
float, and the final u8 conversion rounds then clamps to [0, 255].

Both kernels are expressed as dense per-axis weight matrices applied by
matmul — fully vectorized, and the matrices are built once per distinct
geometry so actor pools can cache them.
"""

from __future__ import annotations

import numpy as np

_LANCZOS_A = 3.0


def lanczos3_kernel(x):
    """L(x) = sinc(x) * sinc(x/3) for |x| < 3, else 0."""
    x = np.asarray(x, dtype=np.float64)
    out = np.sinc(x) * np.sinc(x / _LANCZOS_A)
    return np.where(np.abs(x) < _LANCZOS_A, out, 0.0)


def _axis_weights(src_size, centers, scale, kernel=lanczos3_kernel, support=_LANCZOS_A,
                  zero_outside=False):
    """Dense (dst_size x src_size) weight matrix for one axis.

    centers: float array of source-space sample coordinates (pixel-center
    convention: source pixel p covers [p, p+1), center p+0.5).
    scale: kernel stretch factor, max(src/dst ratio, 1) for downsampling.
    zero_outside: if True, rows whose center lies outside [0, src_size]
    produce all-zero weights (warp: outside source -> transparent);
    otherwise edge weights renormalize over in-range taps (resize: clamp).
    """
    centers = np.asarray(centers, dtype=np.float64)
    scale = max(float(scale), 1.0)
    rad = support * scale
    left = np.floor(centers - rad).astype(np.int64)
    n_tap = int(np.ceil(2.0 * rad)) + 2
    taps = left[:, None] + np.arange(n_tap)[None, :]          # (dst, taps)
    dist = (taps + 0.5 - centers[:, None]) / scale
    w = kernel(dist)
    valid = (taps >= 0) & (taps < src_size)
    w = np.where(valid, w, 0.0)
    sums = w.sum(axis=1, keepdims=True)
    sums[sums == 0.0] = 1.0
    w = w / sums
    if zero_outside:
        outside = (centers < 0.0) | (centers > src_size)
        w[outside] = 0.0
    mat = np.zeros((len(centers), src_size), dtype=np.float32)
    rows = np.repeat(np.arange(len(centers)), n_tap)
    np.add.at(mat, (rows, np.clip(taps, 0, src_size - 1).ravel()), w.ravel())
    return mat


def _bilinear_kernel(x):
    x = np.abs(np.asarray(x, dtype=np.float64))
    return np.where(x < 1.0, 1.0 - x, 0.0)


def resize(img, out_h, out_w, kernel="lanczos3"):
    """Resize HxWxC (or HxW) uint8 -> (out_h, out_w[, C]) uint8.

    Pixel-center mapping center_i = (i + 0.5) * ratio, matching the image
    crate's `sample` geometry used by the reference's compose step.
    """
    img = np.asarray(img)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    h, w, c = img.shape
    kfn, sup = ((lanczos3_kernel, _LANCZOS_A) if kernel == "lanczos3"
                else (_bilinear_kernel, 1.0))
    ry, rx = h / out_h, w / out_w
    wy = _axis_weights(h, (np.arange(out_h) + 0.5) * ry, ry, kfn, sup)
    wx = _axis_weights(w, (np.arange(out_w) + 0.5) * rx, rx, kfn, sup)
    f = img.reshape(h, w * c).astype(np.float32)
    tmp = (wy @ f).reshape(out_h, w, c)                       # vertical pass
    tmp = np.moveaxis(tmp, 1, 2).reshape(out_h * c, w)
    out = (wx @ tmp.T).T.reshape(out_h, c, out_w)             # horizontal pass
    out = np.moveaxis(out, 1, 2)
    out = np.clip(np.rint(out), 0.0, 255.0).astype(np.uint8)
    return out[:, :, 0] if squeeze else out


def separable_warp(img, src_x_centers, src_y_centers, scale_x, scale_y,
                   kernel="lanczos3"):
    """Warp via independent per-axis resampling (valid whenever the
    dst->src mapping is axis-separable, which holds for 4326<->3857 and any
    axis-aligned affine). Samples whose center falls outside the source
    extent come out zero in every band (-> transparent, GDAL-nodata-like).

    img: (H, W, C) uint8; src_*_centers: source pixel coords (float) for
    each dst column / row; scale_*: local src/dst pixel-size ratio.
    Returns (len(src_y_centers), len(src_x_centers), C) uint8.
    """
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    kfn, sup = ((lanczos3_kernel, _LANCZOS_A) if kernel == "lanczos3"
                else (_bilinear_kernel, 1.0))
    wy = _axis_weights(h, src_y_centers, scale_y, kfn, sup, zero_outside=True)
    wx = _axis_weights(w, src_x_centers, scale_x, kfn, sup, zero_outside=True)
    f = img.reshape(h, w * c).astype(np.float32)
    tmp = (wy @ f).reshape(len(src_y_centers), w, c)
    tmp = np.moveaxis(tmp, 1, 2).reshape(len(src_y_centers) * c, w)
    out = (wx @ tmp.T).T.reshape(len(src_y_centers), c, len(src_x_centers))
    out = np.moveaxis(out, 1, 2)
    return np.clip(np.rint(out), 0.0, 255.0).astype(np.uint8)

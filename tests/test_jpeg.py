"""Baseline JPEG codec tests (pure numpy, no external codec)."""

import numpy as np
import pytest

from freemap_tiler_ray import jpeg
from freemap_tiler_ray.codecs import decode_tile, encode_tile


def _gradient(n=256):
    x, y = np.meshgrid(np.arange(n), np.arange(n))
    return np.dstack([x % 256, y % 256, (x + y) % 256]).astype(np.uint8)


def test_roundtrip_gray():
    g = (np.arange(256)[None, :] % 256).repeat(64, 0).astype(np.uint8)
    out = jpeg.jpeg_decode(jpeg.jpeg_encode(g, 85))
    assert out.shape == g.shape
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 2


def test_roundtrip_rgb_gradient():
    img = _gradient()
    out = jpeg.jpeg_decode(jpeg.jpeg_encode(img, 85))
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 2.0           # lossy, but high fidelity at q85
    assert out.shape == img.shape


def test_quality_monotone():
    img = _gradient()
    lo = len(jpeg.jpeg_encode(img, 30))
    hi = len(jpeg.jpeg_encode(img, 95))
    assert lo < hi


def test_non_multiple_of_8():
    img = _gradient()[:100, :52]
    out = jpeg.jpeg_decode(jpeg.jpeg_encode(img, 85))
    assert out.shape == (100, 52, 3)


@pytest.mark.parametrize("opaque", [True, False])
def test_encode_tile_jpeg_alpha_split(opaque):
    """JPEG path: alpha split + opaque detection (processor.rs:505-517)."""
    rng = np.random.default_rng(3)
    buf = _gradient(64)
    alpha = (np.full((64, 64), 255, np.uint8) if opaque
             else rng.integers(0, 256, (64, 64), dtype=np.uint8))
    tile = np.dstack([buf, alpha])
    data, alpha_blob = encode_tile(tile, "jpeg", 85)
    assert data[:2] == b"\xff\xd8"
    if opaque:
        assert alpha_blob == b""      # fully_opaque -> no alpha blob
    else:
        assert len(alpha_blob) > 0
    back = decode_tile(data, alpha_blob, "jpeg", 64)
    assert back.shape == tile.shape
    np.testing.assert_array_equal(back[:, :, 3], alpha)  # alpha lossless
    assert np.abs(back[:, :, :3].astype(int) - buf.astype(int)).mean() < 3.0


from hypothesis import given, settings
from hypothesis import strategies as st
import numpy as np


@given(st.integers(0, 2**32 - 1), st.sampled_from([25, 60, 85, 95]),
       st.sampled_from([(24, 24, 3), (17, 31, 3), (40, 8, 1)]))
@settings(max_examples=25, deadline=None)
def test_jpeg_roundtrip_property(seed, quality, shape):
    """Random images round-trip within the quantization error bound."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    if shape[-1] == 1:
        img = img[:, :, 0]
    out = jpeg.jpeg_decode(jpeg.jpeg_encode(img, quality))
    assert out.shape == img.shape
    # random noise is worst-case for JPEG; bound mean abs error loosely
    err = np.abs(out.astype(int) - img.astype(int)).mean()
    assert err < (60 if quality <= 25 else 35)

"""Codec + resample kernel tests (no Ray)."""

import numpy as np
import pytest

from freemap_tiler_ray import codecs, resample
from freemap_tiler_ray.geo import (doc_lonlat, lonlat_to_mercator,
                                   mercator_to_lonlat, transform_bounds)

rng = np.random.default_rng(42)


@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_png_roundtrip(c):
    img = rng.integers(0, 256, size=(64, 48, c), dtype=np.uint8)
    data = codecs.png_encode(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    out = codecs.png_decode(data)
    np.testing.assert_array_equal(out, img)


def test_png_gradient_roundtrip():
    x, y = np.meshgrid(np.arange(256), np.arange(256))
    img = np.dstack([x % 256, y % 256, (x + y) % 256,
                     np.full_like(x, 255)]).astype(np.uint8)
    np.testing.assert_array_equal(codecs.png_decode(codecs.png_encode(img)), img)


def test_alpha_roundtrip():
    alpha = rng.integers(0, 256, size=256 * 256, dtype=np.uint8).tobytes()
    blob = codecs.compress_alpha(alpha)
    out = codecs.decompress_alpha(blob, 256 * 256)
    assert out.tobytes() == alpha
    # alpha blobs are REAL zstd frames (reference processor.rs:518 —
    # freemap-tileserver's alpha extension must be able to decode them)
    assert blob[:4] == codecs._ZSTD_MAGIC
    # empty blob = fully opaque marker
    assert (codecs.decompress_alpha(b"", 16) == 255).all()


def test_encode_tile_png():
    buf = rng.integers(0, 256, size=(32, 32, 4), dtype=np.uint8)
    data, alpha = codecs.encode_tile(buf, "png")
    assert alpha == b""
    np.testing.assert_array_equal(codecs.decode_tile(data, alpha, "png", 32), buf)


def test_lanczos_identity():
    img = rng.integers(0, 256, size=(64, 64, 4), dtype=np.uint8)
    out = resample.resize(img, 64, 64)
    np.testing.assert_array_equal(out, img)


def test_lanczos_downsample_constant():
    img = np.full((64, 64, 2), 200, np.uint8)
    out = resample.resize(img, 32, 32)
    np.testing.assert_array_equal(out, img[:32, :32])


def test_lanczos_downsample_2to1_mean_preserving():
    img = np.zeros((64, 64, 1), np.uint8)
    img[:, 32:] = 255
    out = resample.resize(img, 32, 32)
    # left half stays dark, right half stays bright; edge rings a little
    assert out[:, :12].max() <= 10
    assert out[:, 20:].min() >= 245


def test_separable_warp_identity():
    img = rng.integers(0, 256, size=(32, 32, 4), dtype=np.uint8)
    out = resample.separable_warp(img, np.arange(32) + 0.5, np.arange(32) + 0.5,
                                  1.0, 1.0)
    np.testing.assert_array_equal(out, img)


def test_separable_warp_outside_is_zero():
    img = np.full((16, 16, 4), 255, np.uint8)
    out = resample.separable_warp(img, np.array([-5.0, 8.0]),
                                  np.array([8.0]), 1.0, 1.0)
    assert (out[0, 0] == 0).all() and (out[0, 1] == 255).all()


def test_mercator_roundtrip():
    lon = np.linspace(-179.9, 179.9, 41)
    lat = np.linspace(-84.9, 84.9, 41)
    x, y = lonlat_to_mercator(lon, lat)
    lon2, lat2 = mercator_to_lonlat(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_doc_lonlat_deterministic_and_ranged():
    ids = np.arange(10_000, dtype=np.int64)
    lon, lat = doc_lonlat(ids)
    lon2, lat2 = doc_lonlat(ids)
    np.testing.assert_array_equal(lon, lon2)
    assert lon.min() >= -180 and lon.max() < 180
    assert lat.min() >= -85 and lat.max() < 85
    # spread: not everything in one cell
    assert len(np.unique(np.floor(lon))) > 300


def test_transform_bounds_densified():
    # 4326 -> 3857: max |y| is attained on the horizontal edges' endpoints,
    # but densification must not shrink the envelope
    b = transform_bounds(lonlat_to_mercator, -10, -10, 10, 10)
    x0, y0 = lonlat_to_mercator(-10, -10)
    assert np.isclose(b[0], x0) and np.isclose(b[1], y0)


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.integers(0, 2**32 - 1),
       st.sampled_from([(16, 16), (32, 24), (64, 48)]),
       st.sampled_from([1, 2, 4]))
@settings(max_examples=30, deadline=None)
def test_resample_properties(seed, shape, c):
    """Identity at same size; constant images stay constant under any
    resize; downsample2x equals resize(h/2, w/2) exactly."""
    r = np.random.default_rng(seed)
    img = r.integers(0, 256, shape + (c,), dtype=np.uint8)
    np.testing.assert_array_equal(resample.resize(img, *shape), img)
    const = np.full(shape + (c,), int(r.integers(0, 256)), np.uint8)
    out = resample.resize(const, shape[0] // 2 + 1, shape[1] * 2)
    assert (out == const[0, 0, 0]).all()
    np.testing.assert_array_equal(
        resample.downsample2x(img),
        resample.resize(img, shape[0] // 2, shape[1] // 2))

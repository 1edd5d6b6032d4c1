"""RGB<->HLS parity vs Python's colorsys (kornia uses the same formulas with
H scaled to radians), plus round-trip stability."""

import colorsys

import numpy as np

import jax.numpy as jnp

from optimaltextures_tpu.ops import colors


def test_rgb_to_hls_vs_colorsys(rng):
    rgb = rng.random((64, 3), dtype=np.float32)
    got = np.asarray(colors.rgb_to_hls(jnp.asarray(rgb.reshape(1, 8, 8, 3))))
    got = got.reshape(-1, 3)
    ref = np.array([colorsys.rgb_to_hls(*px) for px in rgb])  # (h[0..1], l, s)
    np.testing.assert_allclose(got[:, 0] / (2 * np.pi), ref[:, 0], atol=1e-5)
    np.testing.assert_allclose(got[:, 1], ref[:, 1], atol=1e-6)
    np.testing.assert_allclose(got[:, 2], ref[:, 2], atol=1e-4)


def test_hls_to_rgb_vs_colorsys(rng):
    hls = rng.random((64, 3), dtype=np.float32)
    arr = hls.copy()
    arr[:, 0] *= 2 * np.pi
    got = np.asarray(colors.hls_to_rgb(jnp.asarray(arr.reshape(1, 8, 8, 3))))
    got = got.reshape(-1, 3)
    ref = np.array([colorsys.hls_to_rgb(h, l, s) for h, l, s in hls])
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_roundtrip(rng):
    rgb = rng.random((1, 16, 16, 3), dtype=np.float32)
    back = np.asarray(colors.hls_to_rgb(colors.rgb_to_hls(jnp.asarray(rgb))))
    np.testing.assert_allclose(back, rgb, atol=1e-4)


def test_grays_and_extremes():
    px = np.array([[0, 0, 0], [1, 1, 1], [0.5, 0.5, 0.5], [1, 0, 0], [0, 1, 0],
                   [0, 0, 1], [1, 1, 0]], dtype=np.float32)
    hls = np.asarray(colors.rgb_to_hls(jnp.asarray(px.reshape(1, 1, 7, 3))))
    assert np.isfinite(hls).all()
    back = np.asarray(colors.hls_to_rgb(jnp.asarray(hls)))
    np.testing.assert_allclose(back.reshape(-1, 3), px, atol=1e-4)


def test_swap_lightness(rng):
    content = rng.random((1, 8, 8, 3), dtype=np.float32)
    pastiche = rng.random((1, 8, 8, 3), dtype=np.float32)
    out = np.asarray(colors.swap_lightness(jnp.asarray(content), jnp.asarray(pastiche)))
    out_l = np.asarray(colors.rgb_to_hls(jnp.asarray(out)))[..., 1]
    want_l = np.asarray(colors.rgb_to_hls(jnp.asarray(pastiche)))[..., 1]
    np.testing.assert_allclose(out_l, want_l, atol=1e-3)

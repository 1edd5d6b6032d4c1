"""Tileable synthesis (extension beyond the reference).

The exact property behind "tiles seamlessly": with circular conv padding and
wrap-tap resampling, every pastiche-path op commutes with circular shifts by
multiples of the total pooling stride, and the OT statistics are global
(shift-invariant) — so the whole run is translation-equivariant on the torus.
These tests assert that equivariance directly (up to f32 reduction noise in
the pastiche-side covariance sums), which is a far stronger guarantee than a
visual seam check.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optimaltextures_tpu import core
from optimaltextures_tpu.config import OptexConfig
from optimaltextures_tpu.models.vgg import VGGBank, encode
from optimaltextures_tpu.ops.resize import resize_nhwc
from optimaltextures_tpu.utils import imageio

STYLE = "/root/reference/style/graffiti.jpg"


def tiny_cfg(**kw):
    base = dict(size=64, passes=1, iters=8, no_multires=True, depth=2, seed=0,
                style=[STYLE], tileable=True)
    base.update(kw)
    return OptexConfig(**base)


def _roll(x, dy, dx):
    return jnp.roll(x, (dy, dx), axis=(1, 2))


# --- unit: the building blocks are circularly shift-equivariant -------------


@pytest.mark.parametrize("in_size,out_size,m", [(32, 64, 3), (64, 32, 4),
                                                (64, 256, 16)])
def test_circular_resize_shift_equivariance(in_size, out_size, m):
    key = jax.random.key(0)
    x = jax.random.uniform(key, (1, in_size, in_size, 3))
    shifted_then_resized = resize_nhwc(_roll(x, m, m), (out_size, out_size),
                                       circular=True)
    mo = m * out_size // in_size
    resized_then_shifted = _roll(resize_nhwc(x, (out_size, out_size),
                                             circular=True), mo, mo)
    np.testing.assert_allclose(np.asarray(shifted_then_resized),
                               np.asarray(resized_then_shifted),
                               rtol=0, atol=1e-6)


def test_circular_resize_preserves_mean():
    # wrap taps always sum to the full (normalized) kernel, so a constant
    # image stays exactly constant — no border droop
    x = jnp.full((1, 48, 48, 3), 0.7)
    y = resize_nhwc(x, (96, 96), circular=True)
    np.testing.assert_allclose(np.asarray(y), 0.7, atol=1e-6)


def test_wrap_encode_shift_equivariance():
    bank = VGGBank(2)
    x = jax.random.uniform(jax.random.key(1), (1, 32, 32, 3))
    m = 4  # multiple of the depth-2 pooling stride (2)
    a = encode(bank.enc_params[2], 2, _roll(x, m, m), "wrap")
    b = _roll(encode(bank.enc_params[2], 2, x, "wrap"), m // 2, m // 2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


# --- integration: the full run is equivariant on the torus ------------------


@pytest.mark.parametrize("hist_mode", ["chol", "cdf"])
def test_tileable_run_shift_equivariance(hist_mode):
    cfg = tiny_cfg(hist_mode=hist_mode, iters=6)
    styles = [imageio.load_image(STYLE, 64, oversize=False)]
    noise = jax.random.uniform(jax.random.key(7), (1, 64, 64, 3))
    m = 16  # multiple of the depth-2 pooling stride

    out = core.Synthesizer(cfg).run(noise, styles)
    out_shifted = core.Synthesizer(cfg).run(_roll(noise, m, m), styles)
    err_wrap = float(jnp.abs(out_shifted - _roll(out, m, m)).max())
    # f32 covariance/histogram sums reorder under the roll; everything else
    # is exact
    assert err_wrap < 1e-2, err_wrap

    # the reference's reflection padding is NOT torus-equivariant: the same
    # experiment must show real border disagreement
    rcfg = tiny_cfg(hist_mode=hist_mode, iters=6, tileable=False)
    rout = core.Synthesizer(rcfg).run(noise, styles)
    rout_shifted = core.Synthesizer(rcfg).run(_roll(noise, m, m), styles)
    err_reflect = float(jnp.abs(rout_shifted - _roll(rout, m, m)).max())
    assert err_reflect > 10 * max(err_wrap, 1e-4), (err_reflect, err_wrap)


def test_tileable_multires_shift_equivariance():
    # multires exercises the circular resize inside the pass plan:
    # 64 -> 256 (pass 0) -> 64 (pass 1); a roll of 16 at 64px maps to 64 at
    # 256px, both multiples of the depth-2 stride
    cfg = tiny_cfg(no_multires=False, passes=2, iters=4)
    styles = [imageio.load_image(STYLE, 64, oversize=False)]
    noise = jax.random.uniform(jax.random.key(3), (1, 64, 64, 3))
    m = 16
    out = core.Synthesizer(cfg).run(noise, styles)
    out_shifted = core.Synthesizer(cfg).run(_roll(noise, m, m), styles)
    err = float(jnp.abs(out_shifted - _roll(out, m, m)).max())
    assert err < 2e-2, err


# --- surface: config/CLI/filename -------------------------------------------


def test_tileable_composes_with_sharding():
    """Tileable + DP and tileable + SP equal the single-device tileable run
    (wrap halos ride the circular ppermute ring; per-image wrap pads are
    local under batch sharding)."""
    styles = [imageio.load_image(STYLE, 64, oversize=False)]
    from optimaltextures_tpu import core as _core

    base = dict(size=64, passes=1, iters=4, no_multires=True, depth=2,
                seed=21, style=[STYLE], tileable=True)
    noise = jax.random.uniform(jax.random.key(4), (8, 64, 64, 3))
    out1 = _core.Synthesizer(OptexConfig(**base, batch=8)).run(noise, styles)
    out8 = _core.Synthesizer(OptexConfig(**base, batch=8,
                                         num_devices=8)).run(noise, styles)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(out1),
                               rtol=2e-3, atol=2e-3)

    one = jax.random.uniform(jax.random.key(5), (1, 64, 64, 3))
    sp1 = _core.Synthesizer(OptexConfig(**base)).run(one, styles)
    sp8 = _core.Synthesizer(OptexConfig(**base,
                                        spatial_devices=8)).run(one, styles)
    np.testing.assert_allclose(np.asarray(sp8), np.asarray(sp1),
                               rtol=2e-3, atol=2e-3)

    # and the SP tileable run is itself torus-equivariant (the property
    # that makes the output tile) for strides divisible by the mesh chunk
    m = 16
    sp8b = _core.Synthesizer(OptexConfig(**base, spatial_devices=8)).run(
        _roll(one, m, m), styles)
    err = float(jnp.abs(sp8b - _roll(jnp.asarray(sp8), m, m)).max())
    assert err < 1e-2, err


def test_tileable_in_filename_codec():
    cfg = tiny_cfg()
    assert "tileable" in imageio.output_name(cfg)
    assert "tileable" not in imageio.output_name(tiny_cfg(tileable=False))


def test_tileable_cli_flag():
    from optimaltextures_tpu.cli import build_parser

    args = build_parser().parse_args(["--tileable", "--size", "64"])
    assert args.tileable is True
    from optimaltextures_tpu.api import config_from_args

    assert config_from_args(args).tileable is True

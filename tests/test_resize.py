"""Resize parity: the two-GEMM resampler must match torch
F.interpolate(mode='bicubic', align_corners=False, antialias=True)
(the reference's tensor resize, util.py:105-106), up and down."""

import numpy as np
import pytest

import torch
import torch.nn.functional as F

import jax.numpy as jnp

from optimaltextures_tpu.ops.resize import resize_nearest_nhwc, resize_nhwc


@pytest.mark.parametrize("in_hw,out_hw", [
    ((64, 96), (32, 48)),    # clean 2x down
    ((64, 96), (40, 72)),    # fractional down
    ((32, 48), (64, 96)),    # 2x up
    ((40, 56), (63, 91)),    # fractional up
    ((64, 64), (64, 64)),    # identity
])
def test_bicubic_antialias_parity(in_hw, out_hw, rng):
    x = rng.random((2, *in_hw, 3), dtype=np.float32)
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)), size=out_hw,
                        mode="bicubic", align_corners=False, antialias=True)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    got = np.asarray(resize_nhwc(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_nearest_parity(rng):
    x = rng.random((1, 13, 17, 1), dtype=np.float32)
    for out_hw in [(26, 34), (7, 50), (13, 17)]:
        ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)), size=out_hw,
                            mode="nearest")
        ref = ref.numpy().transpose(0, 2, 3, 1)
        got = np.asarray(resize_nearest_nhwc(jnp.asarray(x), out_hw))
        np.testing.assert_allclose(got, ref)


def test_weight_argument_path_bit_identical(rng):
    """The runtime-array resize (core._resize_dev -> apply_resample with
    device-cached weights) must be BITWISE equal to the traced-constant
    program it replaced — the 8192px fix (docs/PERF.md r4) may not move
    numerics. Covers plain and circular (tileable) weights."""
    from optimaltextures_tpu.core import _resize_dev, _resize_jit

    x = jnp.asarray(rng.random((2, 40, 56, 3), dtype=np.float32))
    for circular in (False, True):
        a = np.asarray(_resize_jit(x, size=(63, 91), circular=circular))
        b = np.asarray(_resize_dev(x, (63, 91), circular=circular))
        np.testing.assert_array_equal(a, b)
    # identity size: both paths must return the input unchanged
    np.testing.assert_array_equal(np.asarray(_resize_dev(x, (40, 56))),
                                  np.asarray(x))

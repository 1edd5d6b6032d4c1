"""Pallas histogram kernel vs the XLA scatter-add reference (interpret mode
on CPU; the compiled path runs on TPU via bench/integration)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from optimaltextures_tpu.ops import histmatch
from optimaltextures_tpu.ops.pallas.histogram import batched_histogram


def _reference(x, lo, hi):
    return jnp.stack([histmatch._histc(x[c], lo[c], hi[c], 256)
                      for c in range(x.shape[0])])


@pytest.mark.parametrize("c,n", [(3, 1000), (8, 512), (5, 700), (16, 4096)])
def test_histogram_matches_xla(c, n, rng):
    x = rng.normal(0, 2, (c, n)).astype(np.float32)
    lo = x.min(axis=1)
    hi = x.max(axis=1)
    ref = np.asarray(_reference(jnp.asarray(x), jnp.asarray(lo), jnp.asarray(hi)))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(batched_histogram(jnp.asarray(x), jnp.asarray(lo),
                                           jnp.asarray(hi)))
    assert got.shape == (c, 256)
    np.testing.assert_array_equal(got, ref)
    assert got.sum() == c * n


def test_histogram_constant_channel(rng):
    x = np.full((2, 300), 5.0, dtype=np.float32)
    lo = x.min(axis=1)
    hi = x.max(axis=1)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(batched_histogram(jnp.asarray(x), jnp.asarray(lo),
                                           jnp.asarray(hi)))
    assert got[:, 0].sum() == 600  # width 0 -> everything in bin 0

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


def test_cdf_remap_matches_xla_path(rng):
    """Fused remap kernel vs the XLA searchsorted/gather path."""
    from optimaltextures_tpu.ops.pallas.cdf_remap import cdf_remap

    c, n = 5, 1500
    t = rng.normal(0, 2, (c, n)).astype(np.float32)
    s = rng.normal(3, 1, (c, n + 300)).astype(np.float32)
    lo = np.minimum(t.min(1), s.min(1))
    hi = np.maximum(t.max(1), s.max(1))
    t_hist = np.asarray(_reference(jnp.asarray(t), jnp.asarray(lo), jnp.asarray(hi)))
    s_hist = np.asarray(_reference(jnp.asarray(s), jnp.asarray(lo), jnp.asarray(hi)))

    ref = np.stack([
        np.asarray(histmatch._cdf_apply_channel(
            jnp.asarray(t[i]), jnp.asarray(t_hist[i]), jnp.asarray(s_hist[i]),
            jnp.asarray(lo[i]), jnp.asarray(hi[i]), 256))
        for i in range(c)
    ])
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(cdf_remap(jnp.asarray(t), jnp.asarray(t_hist),
                                   jnp.asarray(s_hist), jnp.asarray(lo),
                                   jnp.asarray(hi)))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_cdf_match_pallas_vs_xla_full(rng):
    """End-to-end cdf_match: pallas kernels (interpret) vs XLA path."""
    t = rng.normal(0, 1, (1, 16, 20, 4)).astype(np.float32)
    s = rng.normal(4, 2, (1, 12, 12, 4)).astype(np.float32)
    ref = np.asarray(histmatch.cdf_match(jnp.asarray(t), jnp.asarray(s),
                                         use_pallas=False))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(histmatch.cdf_match(jnp.asarray(t), jnp.asarray(s),
                                             use_pallas=True))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)

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


def test_pwl_remap_kernel_matches_xla_twin(rng):
    """New r4 per-sample PWL kernel (interpret) vs histmatch._pwl_apply_rows
    — the two must agree to float noise on generic, constant-channel, and
    edge-heavy inputs."""
    from optimaltextures_tpu.ops.pallas.pwl_remap import pwl_remap

    c, n = 5, 700
    t = rng.normal(0, 3, (c, n)).astype(np.float32)
    s = rng.normal(1, 2, (c, 1200)).astype(np.float32)
    t[3] = 2.5                      # constant target channel
    s[4] = -1.0                     # constant source channel
    lo = np.minimum(t.min(axis=1), s.min(axis=1))
    hi = np.maximum(t.max(axis=1), s.max(axis=1))
    t[2, :50] = hi[2]               # pile samples on the top edge
    t_hist = np.asarray(_reference(jnp.asarray(t), jnp.asarray(lo),
                                   jnp.asarray(hi)))
    s_hist = np.asarray(_reference(jnp.asarray(s), jnp.asarray(lo),
                                   jnp.asarray(hi)))
    t_cdf, s_cdf = histmatch.cdf_cdfs_rows(jnp.asarray(t_hist),
                                           jnp.asarray(s_hist))
    edges = histmatch._edges_rows(jnp.asarray(lo), jnp.asarray(hi), 256)
    remapped = histmatch._remap_table_rows(t_cdf, s_cdf, edges)
    want = np.asarray(histmatch._pwl_apply_rows(
        jnp.asarray(t), remapped, jnp.asarray(lo), jnp.asarray(hi)))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pwl_remap(jnp.asarray(t), remapped,
                                   jnp.asarray(lo), jnp.asarray(hi)))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-5 * scale, rtol=0)


def test_cdf_match_fast_pallas_vs_xla_full(rng):
    """End-to-end cdf_match with the r4 kernels (interpret) vs the pure-XLA
    fast path: the Pallas dispatch must not change results beyond float
    noise."""
    t = rng.normal(0, 2, (1, 24, 24, 6)).astype(np.float32)
    s = rng.normal(1, 3, (1, 20, 20, 6)).astype(np.float32)
    ref = np.asarray(histmatch.cdf_match(jnp.asarray(t), jnp.asarray(s),
                                         use_pallas=False))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(histmatch.cdf_match(jnp.asarray(t), jnp.asarray(s),
                                             use_pallas=True))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-5 * scale, rtol=0)


def test_cdf_fast_vs_legacy_vmapped(rng):
    """The r4 fast path vs the legacy searchsorted/gather oracle: identical
    up to edge-adjacent segment choice (value-continuous)."""
    t = rng.normal(0, 2, (1, 16, 16, 5)).astype(np.float32)
    s = rng.normal(0.5, 2.5, (1, 18, 18, 5)).astype(np.float32)
    tj = jnp.asarray(t).reshape(-1, 5).T
    sj = jnp.asarray(s).reshape(-1, 5).T
    legacy = np.asarray(jax.vmap(
        lambda a, b: histmatch._cdf_match_channel(a, b, 256))(tj, sj))
    fast = np.asarray(histmatch.cdf_match_rows(tj, sj, use_pallas=False))
    scale = np.abs(legacy).max()
    np.testing.assert_allclose(fast, legacy, atol=2e-5 * scale, rtol=0)

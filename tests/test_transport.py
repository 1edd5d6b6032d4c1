"""Transport loop unit tests: rotation sampling, PCA, and equivalence of the
fast moment path with the faithful reference data path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optimaltextures_tpu import transport
from optimaltextures_tpu.ops.rotation import random_rotation


def test_rotation_is_special_orthogonal():
    for i, n in enumerate([3, 7, 64, 129]):
        q = np.asarray(random_rotation(jax.random.key(i), n))
        np.testing.assert_allclose(q @ q.T, np.eye(n), atol=1e-4)
        assert abs(np.linalg.det(q) - 1.0) < 1e-3


def test_rotation_is_haar_ish():
    """First-moment sanity: entries of Haar rotations average to ~0 and the
    first column is uniform on the sphere (mean norm contribution 1/n)."""
    n = 16
    qs = np.stack([np.asarray(random_rotation(jax.random.key(i), n)) for i in range(64)])
    assert abs(qs.mean()) < 0.02
    np.testing.assert_allclose((qs[:, :, 0] ** 2).sum(1), 1.0, atol=1e-4)


def test_pca_matches_torch_svd(rng):
    import torch

    x = rng.normal(0, 1, (1, 16, 16, 12)).astype(np.float32)
    x[..., :3] *= 10.0  # give the spectrum some decay
    s, v = transport.pca_spectrum(jnp.asarray(x))
    s = np.asarray(s)

    xt = torch.from_numpy(x.reshape(-1, 12) - x.mean())
    _, ts, tv = torch.svd(xt)
    np.testing.assert_allclose(s, ts.numpy(), rtol=1e-3, atol=1e-3)

    k = transport.choose_k(s)
    tk = int((torch.cumsum(ts / ts.sum(), 0) > 0.9).int().argmax())
    assert k == max(tk, 1)

    # subspace parity for the kept components (signs may differ)
    v = np.asarray(v)[:, :k]
    tvk = tv.numpy()[:, :k]
    np.testing.assert_allclose(v @ v.T, tvk @ tvk.T, atol=1e-3)


@pytest.mark.parametrize("mode", ["chol", "pca", "sym"])
def test_fast_moment_path_equals_reference_path(mode, rng):
    """ot_step_moment (precomputed style cov + folded operator) must equal the
    faithful rotate/match/unrotate path given the same PRNG key."""
    key = jax.random.key(42)
    feat = jnp.asarray(rng.normal(1.0, 2.0, (2, 8, 8, 10)).astype(np.float32))
    style = jnp.asarray(rng.normal(-1.0, 1.5, (1, 9, 7, 10)).astype(np.float32))

    ref = np.asarray(transport.ot_step_reference(key, feat, style, mode))
    stats = transport.style_stats(style, need_samples=False)
    got = np.asarray(transport.ot_step_moment(key, feat, stats, mode))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_transport_loop_converges_to_style_stats(rng):
    """After enough sliced-OT iterations the feature cloud's mean/cov approach
    the style's — the core algorithmic guarantee."""
    key = jax.random.key(0)
    feat = jnp.asarray(rng.normal(0.0, 1.0, (1, 16, 16, 4)).astype(np.float32))
    cov = np.array([[4.0, 1, 0, 0], [1, 2, 0, 0], [0, 0, 1, 0.5], [0, 0, 0.5, 1]])
    style_np = rng.multivariate_normal([5, -3, 0, 1], cov, 400).astype(np.float32)
    style = jnp.asarray(style_np.reshape(1, 20, 20, 4))

    stats = transport.style_stats(style, need_samples=False)
    out = np.asarray(transport.transport_loop(key, feat, stats, 30, "chol"))
    np.testing.assert_allclose(out.mean((0, 1, 2)), style_np.mean(0), atol=0.3)
    out_c = np.cov(out.reshape(-1, 4).T)
    np.testing.assert_allclose(out_c, np.cov(style_np.T), atol=0.6)


def test_transport_loop_content_pull(rng):
    """With huge content strength the features lock onto the content."""
    key = jax.random.key(1)
    feat = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 4)).astype(np.float32))
    style = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 4)).astype(np.float32))
    content = jnp.asarray(rng.normal(3, 1, (1, 8, 8, 4)).astype(np.float32))
    stats = transport.style_stats(style, need_samples=False)
    out = np.asarray(transport.transport_loop(key, feat, stats, 5, "chol",
                                              content_feature=content,
                                              content_strength=0.999))
    np.testing.assert_allclose(out, np.asarray(content), atol=0.15)


def test_transport_loop_cdf_mode_runs(rng):
    key = jax.random.key(2)
    feat = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 3)).astype(np.float32))
    style = jnp.asarray(rng.normal(4, 0.5, (1, 8, 8, 3)).astype(np.float32))
    stats = transport.style_stats(style, need_samples=True)
    out = np.asarray(transport.transport_loop(key, feat, stats, 10, "cdf"))
    assert np.isfinite(out).all()
    assert abs(out.mean() - 4.0) < 0.5


def test_polar_rotations_are_special_orthogonal():
    from optimaltextures_tpu.ops.rotation import random_rotations_polar

    qs = np.asarray(random_rotations_polar(jax.random.key(7), 8, 64))
    assert qs.shape == (8, 64, 64)
    for q in qs:
        np.testing.assert_allclose(q @ q.T, np.eye(64), atol=2e-4)
        assert abs(np.linalg.det(q) - 1.0) < 1e-2


def test_masked_rotations_blockdiag():
    """stage_rotations_masked(k) gives blockdiag(SO(k), I): identity outside
    the active block, special-orthogonal inside, and for k == n it equals the
    unmasked sampler exactly (same Gaussian draw)."""
    from optimaltextures_tpu.ops.rotation import (stage_rotations,
                                                  stage_rotations_masked)

    key = jax.random.key(13)
    n, k = 32, 20
    qs = np.asarray(stage_rotations_masked(key, 4, n, jnp.int32(k)))
    for q in qs:
        np.testing.assert_allclose(q[k:, k:], np.eye(n - k), atol=1e-4)
        np.testing.assert_allclose(q[:k, k:], 0, atol=1e-4)
        np.testing.assert_allclose(q[k:, :k], 0, atol=1e-4)
        blk = q[:k, :k]
        np.testing.assert_allclose(blk @ blk.T, np.eye(k), atol=2e-4)
        assert abs(np.linalg.det(blk) - 1.0) < 1e-2

    full = np.asarray(stage_rotations(key, 4, n))
    masked_full = np.asarray(stage_rotations_masked(key, 4, n, jnp.int32(n)))
    np.testing.assert_allclose(masked_full, full, atol=1e-5)


def test_injected_rotation_parity_vs_numpy_oracle(rng):
    """SURVEY §4's cross-backend parity strategy: with an INJECTED rotation,
    one sliced-OT step must match a from-the-spec numpy oracle
    (rotate -> covariance-match with eps=1 ridge -> unrotate,
    optex.py:167-177 + histmatch.py:14-44)."""
    from scipy.stats import special_ortho_group

    c = 12
    rot = special_ortho_group.rvs(c, random_state=7).astype(np.float32)
    feat = rng.normal(1.0, 2.0, (1, 9, 11, c)).astype(np.float32)
    style = rng.normal(-0.5, 1.5, (1, 8, 8, c)).astype(np.float32)

    # numpy oracle, float64
    def np_stats(x):
        mu = x.mean(axis=(1, 2), keepdims=True)
        xc = (x - mu).reshape(-1, c).T
        return mu, xc @ xc.T / xc.shape[1] + np.eye(c)

    r64 = rot.astype(np.float64)
    rf = feat.astype(np.float64) @ r64
    rs = style.astype(np.float64) @ r64
    mu_t, cov_t = np_stats(rf)
    mu_s, cov_s = np_stats(rs)
    a = np.linalg.cholesky(cov_s) @ np.linalg.inv(np.linalg.cholesky(cov_t))
    matched = ((a @ (rf - mu_t).reshape(-1, c).T).T.reshape(rf.shape) + mu_s)
    expected = matched @ r64.T

    stats = transport.style_stats(jnp.asarray(style), need_samples=False)
    got = np.asarray(transport._moment_step_with_rot(
        jnp.asarray(rot), jnp.asarray(feat), stats, "chol", 1.0))
    np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("mode", ["chol", "pca", "sym"])
def test_covariance_propagation_matches_recompute(mode, rng):
    """The covariance-propagated transport_loop (cov' = M^T cov M, one sample
    GEMM/iter) must match an explicit per-iteration recompute loop using the
    SAME rotation stream — the propagation is exact in exact arithmetic; only
    f32 reduction noise may accumulate."""
    from optimaltextures_tpu.ops import histmatch
    from optimaltextures_tpu.ops.rotation import stage_rotations

    key = jax.random.key(9)
    n_iters = 16
    feat = jnp.asarray(rng.normal(1.0, 2.0, (2, 12, 12, 8)).astype(np.float32))
    style = jnp.asarray(rng.normal(-0.5, 1.5, (1, 10, 10, 8)).astype(np.float32))
    stats = transport.style_stats(style, need_samples=False)

    got = np.asarray(transport.transport_loop(key, feat, stats, n_iters, mode))

    # recompute-from-data oracle with the identical rotation stream
    rotations = stage_rotations(key, n_iters, 8)
    oracle = feat
    for i in range(n_iters):
        oracle = transport._moment_step_with_rot(rotations[i], oracle, stats,
                                                 mode, 1.0)
    np.testing.assert_allclose(got, np.asarray(oracle), rtol=2e-3, atol=2e-3)
    # and the final cloud's moments really did land on the style's trajectory
    _, cov_got = histmatch.moment_stats(jnp.asarray(got))
    _, cov_oracle = histmatch.moment_stats(jnp.asarray(np.asarray(oracle)))
    np.testing.assert_allclose(np.asarray(cov_got), np.asarray(cov_oracle),
                               rtol=0, atol=2e-3)


@pytest.mark.parametrize("mode", ["chol", "pca", "sym"])
def test_composed_chain_matches_recompute_with_content(mode, rng):
    """The composed closed-form path (compose_moment_chain: cross-covariance
    propagated through OT step + content pull) must match the per-iteration
    recompute loop with the SAME rotation stream — the composition is exact
    in exact arithmetic; only f32 rounding differs."""
    from optimaltextures_tpu.ops.rotation import stage_rotations

    key = jax.random.key(21)
    n_iters = 16
    s = 0.25
    feat = jnp.asarray(rng.normal(1.0, 2.0, (2, 12, 12, 8)).astype(np.float32))
    content = jnp.asarray(rng.normal(0.5, 1.0, (2, 12, 12, 8)).astype(np.float32))
    style = jnp.asarray(rng.normal(-0.5, 1.5, (1, 10, 10, 8)).astype(np.float32))
    stats = transport.style_stats(style, need_samples=False)

    got = np.asarray(transport.transport_loop(
        key, feat, stats, n_iters, mode,
        content_feature=content, content_strength=s))

    rotations = stage_rotations(key, n_iters, 8)
    oracle = feat
    for i in range(n_iters):
        oracle = transport._moment_step_with_rot(rotations[i], oracle, stats,
                                                 mode, 1.0)
        oracle = oracle + s * (content - oracle)
    np.testing.assert_allclose(got, np.asarray(oracle), rtol=5e-3, atol=5e-3)


def test_composed_chain_single_iteration_exactness(rng):
    """n_iters=1 composed equals the direct single step (no composition
    error at all — catches bias/order mistakes in the scan body)."""
    key = jax.random.key(22)
    feat = jnp.asarray(rng.normal(0, 2.0, (1, 10, 10, 6)).astype(np.float32))
    style = jnp.asarray(rng.normal(1.0, 0.5, (1, 9, 9, 6)).astype(np.float32))
    stats = transport.style_stats(style, need_samples=False)
    from optimaltextures_tpu.ops.rotation import stage_rotations

    got = np.asarray(transport.transport_loop(key, feat, stats, 1, "chol"))
    rot = stage_rotations(key, 1, 6)[0]
    want = np.asarray(transport._moment_step_with_rot(rot, feat, stats,
                                                      "chol", 1.0))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_composed_content_pull_broadcasts_single_content(rng):
    """run() is public API: a batched pastiche with ONE content image used
    to work through the per-iteration loop's implicit (1,H,W,C) broadcast.
    The composed content branch must broadcast too (r4 regression: the
    cross-covariance GEMM saw mismatched row counts and failed at trace)."""
    from optimaltextures_tpu.ops.rotation import stage_rotations

    key = jax.random.key(23)
    n_iters, s = 8, 0.25
    feat = jnp.asarray(rng.normal(1.0, 2.0, (3, 10, 10, 6)).astype(np.float32))
    content = jnp.asarray(rng.normal(0.5, 1.0, (1, 10, 10, 6)).astype(np.float32))
    style = jnp.asarray(rng.normal(-0.5, 1.5, (1, 9, 9, 6)).astype(np.float32))
    stats = transport.style_stats(style, need_samples=False)

    got = np.asarray(transport.transport_loop(
        key, feat, stats, n_iters, "chol",
        content_feature=content, content_strength=s))

    rotations = stage_rotations(key, n_iters, 6)
    oracle = feat
    for i in range(n_iters):
        oracle = transport._moment_step_with_rot(rotations[i], oracle, stats,
                                                 "chol", 1.0)
        oracle = oracle + s * (content - oracle)   # implicit broadcast
    np.testing.assert_allclose(got, np.asarray(oracle), rtol=5e-3, atol=5e-3)

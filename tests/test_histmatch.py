"""Histogram-matching unit tests against independent numpy oracles built from
the reference spec (SURVEY §2.1 #5, /root/reference/histmatch.py semantics)."""

import numpy as np
import pytest

import jax.numpy as jnp

from optimaltextures_tpu.ops import histmatch

MODES = ["chol", "pca", "sym"]


# --- numpy oracle: moment matching per the reference spec -------------------

def np_moment_match(target, source, mode, eps=1.0):
    """(B,H,W,C) numpy oracle: per-(batch,channel) centering, pooled
    covariance + eps ridge, explicit inverse like the reference."""
    def stats(x):
        mu = x.mean(axis=(1, 2), keepdims=True)
        xc = (x - mu).reshape(-1, x.shape[-1]).T  # (C, N)
        cov = xc @ xc.T / xc.shape[1] + eps * np.eye(x.shape[-1])
        return mu, cov, xc

    def psd_sqrt(c):
        eva, eve = np.linalg.eigh(c)
        return eve @ np.diag(np.sqrt(np.maximum(eva, 0))) @ eve.T

    mu_t, cov_t, hist_t = stats(target)
    mu_s, cov_s, _ = stats(source)
    if mode == "chol":
        a = np.linalg.cholesky(cov_s) @ np.linalg.inv(np.linalg.cholesky(cov_t))
    elif mode == "pca":
        a = psd_sqrt(cov_s) @ np.linalg.inv(psd_sqrt(cov_t))
    else:
        qt = psd_sqrt(cov_t)
        a = np.linalg.inv(qt) @ psd_sqrt(qt @ cov_s @ qt) @ np.linalg.inv(qt)
    matched = (a @ hist_t).T.reshape(target.shape)
    return matched + mu_s


# --- numpy oracle: reference interp + cdf match ------------------------------

def np_interp_ref(x, xp, fp):
    idxs = np.searchsorted(xp, x, side="left")
    idxs = np.clip(idxs, 0, len(xp) - 1)
    nxt = np.clip(idxs + 1, 0, len(xp) - 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        slopes = (fp[nxt] - fp[idxs]) / (xp[nxt] - xp[idxs])
        f0 = slopes * (x - xp[idxs]) + fp[idxs]
        f1 = slopes * (x - xp[nxt]) + fp[nxt]
    return np.where(np.isfinite(f0), f0, np.where(np.isfinite(f1), f1, fp[idxs]))


def np_cdf_match_channel(t, s, bins=256):
    lo = min(t.min(), s.min())
    hi = max(t.max(), s.max())
    def histc(x):
        idx = ((x - lo) * bins / (hi - lo)).astype(np.int64)
        idx = np.clip(idx, 0, bins - 1)
        return np.bincount(idx, minlength=bins).astype(np.float64)
    edges = np.linspace(lo, hi, bins + 1)[1:]
    tc = histc(t).cumsum(); tc /= tc[-1]
    sc = histc(s).cumsum(); sc /= sc[-1]
    remapped = np_interp_ref(tc, sc, edges)
    return np_interp_ref(t, edges, remapped)


# --- tests -------------------------------------------------------------------

@pytest.mark.parametrize("mode", MODES)
def test_moment_match_vs_oracle(mode, rng):
    t = rng.normal(2.0, 1.5, (2, 8, 9, 6)).astype(np.float32)
    s = rng.normal(-1.0, 3.0, (1, 7, 5, 6)).astype(np.float32)
    ref = np_moment_match(t.astype(np.float64), s.astype(np.float64), mode)
    got = np.asarray(histmatch.moment_match(jnp.asarray(t), jnp.asarray(s), mode))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mode", MODES + ["cdf"])
def test_self_match_is_identity(mode, rng):
    x = rng.normal(1.0, 2.0, (1, 12, 10, 4)).astype(np.float32)
    got = np.asarray(histmatch.hist_match(jnp.asarray(x), jnp.asarray(x), mode))
    tol = 0.15 if mode == "cdf" else 1e-3  # cdf is quantized to 256 bins
    np.testing.assert_allclose(got, x, atol=tol)


def test_moment_match_matches_target_stats(rng):
    """With a small ridge, chol matching transports mean and covariance onto
    the source's (with eps=1 only the RIDGED covariances map exactly, so the
    output covariance intentionally differs — hence eps=1e-3 here)."""
    t = rng.normal(0.0, 1.0, (1, 32, 32, 5)).astype(np.float32)
    s = rng.normal(3.0, 2.0, (1, 32, 32, 5)).astype(np.float32)
    got = np.asarray(histmatch.moment_match(jnp.asarray(t), jnp.asarray(s), "chol",
                                            eps=1e-3))
    def cov(x):
        mu = x.mean(axis=(1, 2), keepdims=True)
        xc = (x - mu).reshape(-1, x.shape[-1])
        return xc.T @ xc / xc.shape[0]
    np.testing.assert_allclose(cov(got), cov(s), rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(got.mean((0, 1, 2)), s.mean((0, 1, 2)), atol=1e-2)


def test_interp_ref_vs_oracle(rng):
    xp = np.sort(rng.normal(0, 1, 64)).astype(np.float32)
    xp[10:14] = xp[10]  # duplicate nodes -> exercises the non-finite fallback
    fp = rng.normal(0, 1, 64).astype(np.float32)
    x = rng.normal(0, 1, 256).astype(np.float32)
    x = np.clip(x, xp[0], xp[-1])
    ref = np_interp_ref(x.astype(np.float64), xp.astype(np.float64), fp.astype(np.float64))
    got = np.asarray(histmatch.interp_ref(jnp.asarray(x), jnp.asarray(xp), jnp.asarray(fp)))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_cdf_match_vs_oracle(rng):
    t = rng.normal(0.0, 1.0, (1, 16, 16, 3)).astype(np.float32)
    s = rng.normal(2.0, 0.5, (1, 16, 16, 3)).astype(np.float32)
    got = np.asarray(histmatch.cdf_match(jnp.asarray(t), jnp.asarray(s)))
    tf = t.reshape(-1, 3).T
    sf = s.reshape(-1, 3).T
    ref = np.stack([np_cdf_match_channel(tf[c].astype(np.float64),
                                         sf[c].astype(np.float64)) for c in range(3)])
    np.testing.assert_allclose(got, ref.T.reshape(t.shape), rtol=1e-3, atol=1e-3)


def test_cdf_match_moves_distribution(rng):
    """Matched values should take on the source's quantiles."""
    t = rng.normal(0.0, 1.0, (1, 32, 32, 2)).astype(np.float32)
    s = rng.normal(5.0, 0.25, (1, 32, 32, 2)).astype(np.float32)
    got = np.asarray(histmatch.cdf_match(jnp.asarray(t), jnp.asarray(s)))
    assert abs(got.mean() - 5.0) < 0.1
    assert abs(got.std() - 0.25) < 0.1


def test_sort_match_exact_permutation(rng):
    """Equal sample counts: sort matching is exactly the sorted-source values
    rearranged by the target's ranks — the exact 1-D OT assignment."""
    t = rng.normal(0, 1, (1, 8, 8, 3)).astype(np.float32)
    s = rng.normal(4, 2, (1, 8, 8, 3)).astype(np.float32)
    got = np.asarray(histmatch.sort_match(jnp.asarray(t), jnp.asarray(s)))
    # matched distribution IS the source distribution (same multiset)
    np.testing.assert_allclose(np.sort(got.reshape(-1, 3), axis=0),
                               np.sort(s.reshape(-1, 3), axis=0), rtol=1e-6)
    # and order follows the target's order
    tf, gf = t.reshape(-1, 3), got.reshape(-1, 3)
    for ch in range(3):
        assert (np.argsort(tf[:, ch]) == np.argsort(gf[:, ch], kind="stable")).all()


def test_sort_match_unequal_sizes(rng):
    t = rng.normal(0, 1, (1, 10, 10, 2)).astype(np.float32)
    s = rng.normal(5, 0.5, (1, 7, 9, 2)).astype(np.float32)
    got = np.asarray(histmatch.sort_match(jnp.asarray(t), jnp.asarray(s)))
    assert np.isfinite(got).all()
    assert abs(got.mean() - 5.0) < 0.2


def test_cdf_match_constant_channel_is_safe(rng):
    """Degenerate hi == lo must not produce NaNs (the reference would)."""
    t = np.full((1, 4, 4, 2), 3.0, dtype=np.float32)
    s = np.full((1, 4, 4, 2), 3.0, dtype=np.float32)
    got = np.asarray(histmatch.cdf_match(jnp.asarray(t), jnp.asarray(s)))
    assert np.isfinite(got).all()


def test_sort_match_ties_and_oracle(rng):
    """The two-sort formulation (static quantile gather + inverse-permutation
    sort) must equal the direct rank oracle, including on heavily tied
    inputs (stability determines which duplicate gets which quantile)."""
    t = np.round(rng.normal(0, 1, (2, 6, 5, 4)).astype(np.float32), 1)  # ties
    s = np.round(rng.normal(0.5, 2, (1, 9, 7, 4)).astype(np.float32), 1)
    got = np.asarray(histmatch.sort_match(jnp.asarray(t), jnp.asarray(s)))

    tf = t.reshape(-1, 4)
    sf = s.reshape(-1, 4)
    nt, ns = tf.shape[0], sf.shape[0]
    want = np.empty_like(tf)
    for ch in range(4):
        order = np.argsort(tf[:, ch], kind="stable")
        ranks = np.empty(nt, dtype=np.int64)
        ranks[order] = np.arange(nt)
        q = np.clip(((ranks + 0.5) * (ns / nt)).astype(np.int64), 0, ns - 1)
        want[:, ch] = np.sort(sf[:, ch])[q]
    np.testing.assert_array_equal(got.reshape(-1, 4), want)


def test_sort_match_rows_blocked_equals_monolithic(rng, monkeypatch):
    """Channel-blocked sorts (the big-cloud capacity path, including a block
    count that does NOT divide C so the pad rows are exercised) must be
    bit-identical to the one-program path."""
    t = np.round(rng.normal(0, 1, (5, 4096)).astype(np.float32), 2)  # ties
    s = np.round(rng.normal(0.5, 2, (5, 1777)).astype(np.float32), 2)
    want = np.asarray(histmatch.sort_match_rows(jnp.asarray(t), jnp.asarray(s)))
    monkeypatch.setattr(histmatch, "_SORT_BLOCK_ELEMS", 2 * 4096)  # 2-row blocks
    got = np.asarray(histmatch.sort_match_rows(jnp.asarray(t), jnp.asarray(s)))
    np.testing.assert_array_equal(got, want)


def test_style_factor_precompute_matches_full_transform(rng):
    """style_congruence_batch + style_factor_batch + moment_transform_pre
    must reproduce moment_transform exactly for every mode — the loop-body
    rewrite (r3: style side hoisted out of the fori_loop) is a pure
    refactor of the math."""
    import jax

    from optimaltextures_tpu.ops.rotation import stage_rotations

    c, n_rot = 24, 5
    a = rng.normal(size=(c, 3 * c)).astype(np.float32)
    b = rng.normal(size=(c, 3 * c)).astype(np.float32)
    cov_t = jnp.asarray(a @ a.T / (3 * c))
    cov_s = jnp.asarray(b @ b.T / (3 * c))
    rots = stage_rotations(jax.random.key(3), n_rot, c)

    cov_s_rots = histmatch.style_congruence_batch(rots, cov_s)
    for mode in ("chol", "pca", "sym"):
        sfactors = histmatch.style_factor_batch(cov_s_rots, mode, 1.0)
        for i in range(n_rot):
            rot = rots[i]
            cov_t_rot = rot.T @ (cov_t @ rot)
            cov_s_rot = rot.T @ (cov_s @ rot)
            want = histmatch.moment_transform(cov_t_rot, cov_s_rot, mode, 1.0)
            got = histmatch.moment_transform_pre(cov_t_rot, sfactors[i],
                                                 mode, 1.0)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-4, atol=2e-4)

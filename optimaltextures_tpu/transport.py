"""Sliced optimal transport: the hot inner loop, plus PCA fitting.

Reference semantics (``/root/reference/optex.py:167-190``): per iteration draw
a random SO(C) rotation, rotate pastiche+style features, histogram-match each
rotated coordinate, rotate back, optionally blend toward content features.

TPU redesign
------------
* The whole per-layer iteration loop is ONE ``lax.fori_loop`` inside jit with
  a folded PRNG key — zero host syncs where the reference has one per
  iteration (scipy rotation on host).
* For the moment modes (chol/pca/sym — chol is the default), the style's raw
  covariance and mean are computed ONCE per (pass, layer) and re-expressed in
  each iteration's rotated basis by a C x C congruence ``R^T Cov R``
  (mathematically identical to re-rotating the style samples). Further, the
  rotate -> center -> transform -> unrotate chain folds into a single C x C
  operator ``M = R A^T R^T``, so each iteration costs just TWO sample-sized
  GEMMs (pastiche covariance + apply) instead of the reference's six.
* ``cdf`` mode needs per-coordinate order statistics of the rotated style, so
  it runs the faithful rotate/match/unrotate data path.

PCA (``fit_pca``, optex.py:180-190): singular values of the globally-centered
sample matrix via eigh of the C x C Gram matrix (equivalent to torch.svd's
spectrum at a fraction of the cost); keeps the first k components where the
cumulative SINGULAR-VALUE (not variance — faithful to the reference) share
exceeds 0.9.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .ops import histmatch
from .ops.rotation import random_rotation, stage_rotations, stage_rotations_masked

HIGHEST = jax.lax.Precision.HIGHEST


def cov_propagation_enabled() -> bool:
    """OPTEX_NO_COV_PROP=1 restores the recompute-from-data moment loops
    (here and in the DP/spatial variants). Read at TRACE time through
    config.cov_propagation_env_off() — the unified knob-latching rule
    (config.py owns the story): programs already jit-cached in-process
    won't change; set it before the first run."""
    from . import config

    return not config.cov_propagation_env_off()


class StyleStats(NamedTuple):
    """Per-(pass, layer) precomputed style statistics.

    For moment modes only ``mu`` (1, 1, 1, C broadcastable) and ``cov_raw``
    (C, C, ridge NOT included) are used; ``samples`` (Ns, C) is carried for
    cdf mode (None otherwise to keep the jit closure lean).
    """
    mu: jnp.ndarray
    cov_raw: jnp.ndarray
    samples: Optional[jnp.ndarray]


def style_stats(style_feature: jnp.ndarray, need_samples: bool) -> StyleStats:
    """NHWC style features -> precomputed transport statistics."""
    mu, cov = histmatch.moment_stats(style_feature)
    samples = style_feature.reshape(-1, style_feature.shape[-1]) if need_samples else None
    return StyleStats(mu=mu, cov_raw=cov, samples=samples)


def _moment_step_with_rot(rot: jnp.ndarray, feature: jnp.ndarray,
                          stats: StyleStats, mode: str, eps: float) -> jnp.ndarray:
    """One moment-matching sliced-OT step with a supplied rotation.

    matched = (x - mu_t) @ (R A^T R^T) + mu_s with A computed in the rotated
    basis from congruence-rotated covariances — only TWO sample-sized GEMMs.
    """
    c = feature.shape[-1]
    mu_t, cov_t_raw = histmatch.moment_stats(feature)
    # covariances in the rotated basis (congruence instead of sample GEMMs)
    cov_t_rot = jnp.matmul(rot.T, jnp.matmul(cov_t_raw, rot, precision=HIGHEST),
                           precision=HIGHEST)
    cov_s_rot = jnp.matmul(rot.T, jnp.matmul(stats.cov_raw, rot, precision=HIGHEST),
                           precision=HIGHEST)
    a = histmatch.moment_transform(cov_t_rot, cov_s_rot, mode, eps)
    # rotate(center(x)) @ A^T then unrotate, folded into one C x C operator.
    m = jnp.matmul(rot, jnp.matmul(a.T, rot.T, precision=HIGHEST), precision=HIGHEST)

    b, h, w, _ = feature.shape
    xc = (feature - mu_t).reshape(-1, c)
    out = jnp.matmul(xc, m, precision=HIGHEST).reshape(b, h, w, c)
    # mu_s was computed unrotated; rotating then unrotating it is the identity.
    return out + stats.mu


def _moment_step_with_factor(rot: jnp.ndarray, feature: jnp.ndarray,
                             mu_s: jnp.ndarray, sfactor: jnp.ndarray,
                             mode: str, eps: float) -> jnp.ndarray:
    """:func:`_moment_step_with_rot` with the style-side decomposition
    precomputed (histmatch.style_factor_batch) — the loop-body variant."""
    c = feature.shape[-1]
    mu_t, cov_t_raw = histmatch.moment_stats(feature)
    cov_t_rot = jnp.matmul(rot.T, jnp.matmul(cov_t_raw, rot, precision=HIGHEST),
                           precision=HIGHEST)
    a = histmatch.moment_transform_pre(cov_t_rot, sfactor, mode, eps)
    m = jnp.matmul(rot, jnp.matmul(a.T, rot.T, precision=HIGHEST),
                   precision=HIGHEST)
    b, h, w, _ = feature.shape
    xc = (feature - mu_t).reshape(-1, c)
    out = jnp.matmul(xc, m, precision=HIGHEST).reshape(b, h, w, c)
    return out + mu_s


def ot_step_moment(key: jax.Array, feature: jnp.ndarray, stats: StyleStats,
                   mode: str, eps: float = 1.0) -> jnp.ndarray:
    """One sliced-OT iteration, moment fast path, sampling its own rotation."""
    rot = random_rotation(key, feature.shape[-1])
    return _moment_step_with_rot(rot, feature, stats, mode, eps)


def _sampled_step_with_rot(rot: jnp.ndarray, feature: jnp.ndarray,
                           style_samples: jnp.ndarray, mode: str,
                           use_pallas: Optional[bool] = None) -> jnp.ndarray:
    c = feature.shape[-1]
    b, h, w, _ = feature.shape
    rf = jnp.matmul(feature.reshape(-1, c), rot, precision=HIGHEST)
    rs = jnp.matmul(style_samples, rot, precision=HIGHEST)
    if mode == "sort":
        matched = histmatch.sort_match(rf.reshape(b, h, w, c),
                                       rs.reshape(1, -1, 1, c))
    else:
        matched = histmatch.cdf_match(rf.reshape(b, h, w, c),
                                      rs.reshape(1, -1, 1, c),
                                      use_pallas=use_pallas)
    return jnp.matmul(matched.reshape(-1, c), rot.T, precision=HIGHEST
                      ).reshape(b, h, w, c)


def ot_step_sampled(key: jax.Array, feature: jnp.ndarray,
                    style_samples: jnp.ndarray, mode: str,
                    use_pallas: Optional[bool] = None) -> jnp.ndarray:
    """One sliced-OT iteration on raw sample clouds: cdf (256-bin, reference
    semantics) or sort (exact 1-D OT, TPU extension)."""
    rot = random_rotation(key, feature.shape[-1])
    return _sampled_step_with_rot(rot, feature, style_samples, mode, use_pallas)


# backward-compatible alias (cdf only)
def ot_step_cdf(key, feature, style_samples, use_pallas=None):
    return ot_step_sampled(key, feature, style_samples, "cdf", use_pallas)


def ot_step_reference(key: jax.Array, feature: jnp.ndarray, style_feature: jnp.ndarray,
                      mode: str, eps: float = 1.0) -> jnp.ndarray:
    """Faithful rotate/match/unrotate on raw features (optex.py:167-177).

    Used by tests to certify the fast moment path, and as the building block
    for pixel-space color transfer.
    """
    c = feature.shape[-1]
    rot = random_rotation(key, c)
    rf = jnp.einsum("bhwc,cd->bhwd", feature, rot, precision=HIGHEST)
    rs = jnp.einsum("bhwc,cd->bhwd", style_feature, rot, precision=HIGHEST)
    matched = histmatch.hist_match(rf, rs, mode, eps)
    return jnp.einsum("bhwd,cd->bhwc", matched, rot, precision=HIGHEST)


def pca_spectrum(features: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Singular values (descending) and right singular vectors of the
    globally-centered sample matrix, via eigh of the C x C Gram matrix.

    Matches torch.svd's spectrum/V (optex.py:182-183: A = X - X.mean() with a
    SCALAR mean) at O(N C^2) + O(C^3) instead of a full (N, C) SVD. Column
    signs differ from torch — irrelevant, projection is inverted by transpose.
    """
    c = features.shape[-1]
    x = features.reshape(-1, c) - features.mean()
    g = jnp.matmul(x.T, x, precision=HIGHEST)
    eva, eve = jnp.linalg.eigh(g)  # ascending
    s = jnp.sqrt(jnp.maximum(eva[::-1], 0.0))
    return s, eve[:, ::-1]


def choose_k(singular_values) -> int:
    """Host-side: the reference's component count (optex.py:184-185).

    k = FIRST index where cumsum(s / sum(s)) > 0.9 — note this EXCLUDES the
    crossing component (the reference slices ``eigvecs[:, :k]`` with the raw
    index). Clamped to >= 1: the reference would produce an empty projection
    if the first component alone carried >90% (and then crash); we keep one.
    """
    import numpy as np

    s = np.asarray(singular_values, dtype=np.float64)
    frac = np.cumsum(s / s.sum())
    k = int(np.argmax(frac > 0.9))
    return max(k, 1)


def compose_moment_chain(rotations: jnp.ndarray, sfactors: jnp.ndarray,
                         mu0: jnp.ndarray, cov0: jnp.ndarray,
                         mu_s: jnp.ndarray, mode: str, eps: float,
                         content_strength: float = 0.0,
                         cross0: Optional[jnp.ndarray] = None,
                         content_cov: Optional[jnp.ndarray] = None,
                         content_mu: Optional[jnp.ndarray] = None):
    """Fold a whole stage's moment-mode OT iterations (+ the optional content
    pull) into ONE affine map  ``out = feat0 @ A (+ content @ B) + bias``.

    Every moment-mode iteration is affine in the samples —
    ``f -> (f - mu_i) @ m_i + mu_s`` (rotate/match/unrotate folded into the
    C x C operator ``m_i``, see :func:`_moment_step_with_factor`) — and the
    reference's content pull ``f -> f + s*(cf - f)`` (optex.py:115-117) is
    affine in ``(f, cf)``. Crucially ``m_i`` depends on the CURRENT feature
    cloud only through its mean/covariance, which themselves propagate in
    closed form through both maps:

    * OT step:   mu' = mu_s,  cov' = m^T cov m,  X' = m^T X
    * pull:      mu' = (1-s) mu + s mu_cf,
                 cov' = (1-s)^2 cov + (1-s) s (X' + X'^T) + s^2 cov_cf,
                 X'  = (1-s) X + s cov_cf
      (``X = Cov(f, cf)``, the pooled per-image-centered cross-covariance —
      the only extra state content stages need.)

    So the n-iteration sequential chain collapses to a C x C ``lax.scan``
    (every operand is C x C or (B, 1, 1, C)) and the big (B*H*W, C) sample
    buffer is touched ONCE at the end instead of once per iteration. In
    exact arithmetic the result is identical to the iterative loop (the
    r4 saturation trace showed the iterative loops at ~0.7 TF/s taking 32%
    of device time — pure latency, which this removes); only f32 rounding
    differs, bounded by the same argument as cov propagation itself and
    regression-tested against the per-iteration recompute oracle.

    Returns ``(A, B, bias)``; ``B`` is None when there is no content term.
    ``bias`` is (B, 1, 1, C) (per-image biases — per-image means are part of
    the reference semantics, histmatch.py:44).
    """
    c = cov0.shape[-1]
    s = float(content_strength)
    has_content = cross0 is not None and s != 0.0
    eye = jnp.eye(c, dtype=cov0.dtype)
    # under shard_map the scan carry's varying-axes types must be invariant
    # across iterations: seed every replicated init from cov0/mu0 so it
    # inherits their varying axes (EP shards carry per-style stats)
    eye0 = eye + 0.0 * cov0
    zeros_c = 0.0 * cov0
    zeros_b = jnp.zeros_like(mu0)

    def step(carry, inputs):
        if has_content:
            A, Bc, bias, mu, cov, X = carry
        else:
            A, bias, mu, cov = carry
        rot, sfac = inputs
        cov_rot = jnp.matmul(rot.T, jnp.matmul(cov, rot, precision=HIGHEST),
                             precision=HIGHEST)
        a = histmatch.moment_transform_pre(cov_rot, sfac, mode, eps)
        m = jnp.matmul(rot, jnp.matmul(a.T, rot.T, precision=HIGHEST),
                       precision=HIGHEST)
        # OT step: f -> f @ m + (mu_s - mu @ m)
        A = jnp.matmul(A, m, precision=HIGHEST)
        bias = (jnp.matmul(bias, m, precision=HIGHEST)
                + (mu_s - jnp.matmul(mu, m, precision=HIGHEST)))
        mu = zeros_b + mu_s
        cov = jnp.matmul(m.T, jnp.matmul(cov, m, precision=HIGHEST),
                         precision=HIGHEST)
        if not has_content:
            return (A, bias, mu, cov), None
        X = jnp.matmul(m.T, X, precision=HIGHEST)
        Bc = jnp.matmul(Bc, m, precision=HIGHEST)
        # content pull: f -> (1-s) f + s cf
        A = (1.0 - s) * A
        Bc = (1.0 - s) * Bc + s * eye
        bias = (1.0 - s) * bias
        mu = (1.0 - s) * mu + s * content_mu
        cov = ((1.0 - s) ** 2 * cov + (1.0 - s) * s * (X + X.T)
               + s ** 2 * content_cov)
        X = (1.0 - s) * X + s * content_cov
        return (A, Bc, bias, mu, cov, X), None

    bias0 = zeros_b + 0.0 * mu_s
    if has_content:
        init = (eye0, zeros_c, bias0, mu0 + 0.0 * mu_s, cov0, cross0)
        (A, Bc, bias, *_), _ = jax.lax.scan(step, init, (rotations, sfactors))
        return A, Bc, bias
    init = (eye0, bias0, mu0 + 0.0 * mu_s, cov0)
    (A, bias, *_), _ = jax.lax.scan(step, init, (rotations, sfactors))
    return A, None, bias


def stage_affine_map(key: jax.Array, mu0: jnp.ndarray, cov0: jnp.ndarray,
                     stats: StyleStats, n_iters: int, mode: str,
                     eps: float = 1.0,
                     k_mask: Optional[jnp.ndarray] = None):
    """The whole stage's composed affine map from the INITIAL feature moments
    alone: ``out = feat0 @ A + bias``.

    This is :func:`transport_loop`'s composed no-content branch factored out
    so callers that never materialize the full feature cloud in one buffer
    (the batch-chunked execution path, core._pass_stages_chunked_impl) can
    build the map from separately-accumulated joint statistics and apply it
    chunk-by-chunk. Drawing from :func:`stage_rotations` with the same key
    keeps the result identical to the monolithic path.
    """
    c = cov0.shape[-1]
    if k_mask is not None:
        rotations = stage_rotations_masked(key, n_iters, c, k_mask)
    else:
        rotations = stage_rotations(key, n_iters, c)
    cov_s_rots = histmatch.style_congruence_batch(rotations, stats.cov_raw)
    sfactors = histmatch.style_factor_batch(cov_s_rots, mode, eps)
    A, _, bias = compose_moment_chain(rotations, sfactors, mu0, cov0,
                                      stats.mu, mode, eps)
    return A, bias


def transport_loop(key: jax.Array, feature: jnp.ndarray, stats: StyleStats,
                   n_iters: int, mode: str,
                   content_feature: Optional[jnp.ndarray] = None,
                   content_strength: float = 0.0,
                   eps: float = 1.0,
                   k_mask: Optional[jnp.ndarray] = None,
                   use_pallas: Optional[bool] = None,
                   cov_prop: Optional[bool] = None) -> jnp.ndarray:
    """n_iters sliced-OT steps (+ optional content pull) as one fori_loop.

    The content step matches the reference exactly (optex.py:115-117):
    feature += strength * (content_feature - feature) after each OT iter.

    ``k_mask`` (traced scalar) switches to blockdiag(SO(k), I) rotations for
    k-bucketed features (pca_bucket): padded dims stay exactly zero.

    ``cov_prop`` enables the covariance-propagated fast path (None = on;
    OptexConfig.cov_propagation threads through here so the switch
    participates in jit keys; the OPTEX_NO_COV_PROP env escape hatch still
    force-disables for A/B tooling).
    """
    if n_iters == 0:
        return feature

    c = feature.shape[-1]
    moment_mode = mode not in ("cdf", "sort")
    use_prop = ((cov_prop if cov_prop is not None else True)
                and cov_propagation_enabled())
    if (moment_mode and use_prop
            and (content_feature is None or content_strength == 0.0)):
        # Composed closed-form path: the whole stage's iterations fold into
        # one affine map (see compose_moment_chain) — a tiny C x C scan plus
        # ONE sample-sized GEMM, instead of one sample GEMM per sequential
        # iteration. cov_propagation=False / OPTEX_NO_COV_PROP restores the
        # per-iteration recompute loop below for A/B.
        mu0, cov0 = histmatch.moment_stats(feature)
        b, h, w, _ = feature.shape
        A, bias = stage_affine_map(key, mu0, cov0, stats, n_iters, mode, eps,
                                   k_mask)
        out = jnp.matmul(feature.reshape(-1, c), A,
                         precision=HIGHEST).reshape(b, h, w, c)
        return out + bias

    # ALL the stage's rotations from one batched Newton-Schulz polar
    # sampling — pure MXU matmuls, amortized across the whole stage (QR's
    # sequential Householder sweeps are latency-bound on TPU).
    if k_mask is not None:
        rotations = stage_rotations_masked(key, n_iters, c, k_mask)
    else:
        rotations = stage_rotations(key, n_iters, c)

    if moment_mode:
        # the STYLE side of every iteration is carry-independent: batch the
        # congruence rotations AND the style decompositions (cholesky / NS
        # sqrt) out of the sequential loop — each fori_loop iteration keeps
        # only the target-side work on its critical path
        cov_s_rots = histmatch.style_congruence_batch(rotations, stats.cov_raw)
        sfactors = histmatch.style_factor_batch(cov_s_rots, mode, eps)

    if moment_mode and use_prop:
        # composed path WITH the content pull (content stages are
        # single-image — never chunked — so this branch stays inline)
        mu0, cov0 = histmatch.moment_stats(feature)
        b, h, w, _ = feature.shape
        mu_cf, cov_cf = histmatch.moment_stats(content_feature)
        if content_feature.shape[0] != b:
            # batched pastiche pulled toward ONE content image: the
            # per-iteration loop below broadcast `cf - feat` implicitly;
            # here the cross-covariance and the final affine application
            # need matching row counts, so materialize the broadcast
            # (stats above are broadcast-invariant)
            content_feature = jnp.broadcast_to(content_feature,
                                               (b, h, w, c))
        fc = (feature - mu0).reshape(-1, c)
        cc = (content_feature - mu_cf).reshape(-1, c)
        cross0 = jnp.matmul(fc.T, cc, precision=HIGHEST) / fc.shape[0]
        A, Bc, bias = compose_moment_chain(
            rotations, sfactors, mu0, cov0, stats.mu, mode, eps,
            content_strength, cross0, cov_cf, mu_cf)
        out = (jnp.matmul(feature.reshape(-1, c), A, precision=HIGHEST)
               + jnp.matmul(content_feature.reshape(-1, c), Bc,
                            precision=HIGHEST)).reshape(b, h, w, c)
        return out + bias

    def body(i, feat):
        rot = rotations[i]
        if mode in ("cdf", "sort"):
            feat = _sampled_step_with_rot(rot, feat, stats.samples, mode,
                                          use_pallas)
        else:
            feat = _moment_step_with_factor(rot, feat, stats.mu, sfactors[i],
                                            mode, eps)
        if content_feature is not None:
            feat = feat + content_strength * (content_feature - feat)
        return feat

    return jax.lax.fori_loop(0, n_iters, body, feature)

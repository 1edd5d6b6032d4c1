"""Histogram matching — the sliced-OT projection kernel.

Four modes with reference semantics (``/root/reference/histmatch.py:5-92``):

* ``chol`` / ``pca`` / ``sym``: first/second-moment matching through the
  C x C channel covariance with a large ``eps=1`` ridge (features are
  post-ReLU, large scale — the ridge is intentional). The reference permutes
  NHWC -> (C, B, H, W) and works row-major; here everything stays (..., C)
  sample-major so the big contractions are plain (N, C) GEMMs on the MXU, and
  explicit ``torch.inverse`` calls become triangular solves / eigh-inverses.
  Centering is per (batch-element, channel) but the covariance pools all
  samples, exactly like the reference (histmatch.py:16-22).

* ``cdf``: exact per-channel 1-D CDF matching with 256 shared-range bins,
  replicating torch.histc binning and the reference's custom ``interp``
  (searchsorted + slope + two-stage non-finite fallback, histmatch.py:72-92)
  — implemented branchlessly and vmapped over channels instead of the
  reference's per-channel python loop (histmatch.py:51).

The moment modes additionally expose a *decomposed* form
(:func:`moment_stats`, :func:`moment_transform`) used by the transport loop:
matching in a rotated basis only needs the rotated covariance
``R^T Cov R + eps I``, so the style's raw covariance is computed once per
(pass, layer) and re-rotated per iteration — identical math, ~3x fewer
sample-sized GEMMs than re-encoding the style every iteration.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


# ----------------------------------------------------------------------------
# Moment matching (chol / pca / sym)


def moment_stats(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(batch, channel) mean and pooled RAW channel covariance (no ridge).

    x: (B, H, W, C) -> mu (B, 1, 1, C), cov (C, C) with
    cov = sum_b sum_hw (x - mu_b)(x - mu_b)^T / (B*H*W).
    """
    b, h, w, c = x.shape
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    xc = (x - mu).reshape(-1, c)
    cov = jnp.matmul(xc.T, xc, precision=HIGHEST) / xc.shape[0]
    return mu, cov


_NS_ITERS = 40


def _psd_sqrt_and_inv(cov: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric PSD square root AND its inverse by coupled Newton-Schulz.

    The reference reaches the matrix square root through eigh
    (histmatch.py:30-33); on TPU eigh is slow (sequential QR sweeps) and
    jax's float32 eigh loses ~1e-2 of eigenvector accuracy even at tiny
    condition numbers. The coupled Newton-Schulz iteration

        Y_0 = A/a,  Z_0 = I,
        T_k = (3 I - Z_k Y_k) / 2,  Y_{k+1} = Y_k T_k,  Z_{k+1} = T_k Z_k,
        sqrt(A) = Y_inf * sqrt(a),  sqrt(A)^-1 = Z_inf / sqrt(a)

    is pure MXU matmuls, converges quadratically once eigenvalues approach 1,
    and yields BOTH factors at once (the modes need Q and Q^{-1}). The eps=1
    ridge guarantees positive-definiteness; scaling by the Frobenius norm
    bounds the normalized spectrum in (0, 1]. 40 iterations cover condition
    numbers beyond 1e5 (worst case for post-ReLU VGG covariances).
    """
    c = cov.shape[0]
    eye = jnp.eye(c, dtype=cov.dtype)
    alpha = jnp.sqrt(jnp.sum(cov * cov))  # ||A||_F >= lambda_max
    y = cov / alpha
    z = eye

    def body(_, yz):
        y, z = yz
        t = 0.5 * (3.0 * eye - jnp.matmul(z, y, precision=HIGHEST))
        return (jnp.matmul(y, t, precision=HIGHEST),
                jnp.matmul(t, z, precision=HIGHEST))

    y, z = jax.lax.fori_loop(0, _NS_ITERS, body, (y, z))
    sa = jnp.sqrt(alpha)
    return y * sa, z / sa


def moment_transform(cov_t: jnp.ndarray, cov_s: jnp.ndarray, mode: str,
                     eps: float = 1.0) -> jnp.ndarray:
    """C x C matrix A such that matched = centered_target @ A^T + mu_source.

    cov_t / cov_s are RAW covariances; the eps ridge is added here
    (histmatch.py:18,22). A equals the reference's left-multiplied operator:
    chol: L_s L_t^{-1} | pca: Q_s Q_t^{-1} | sym: Q_t^{-1} (Q_t C_s Q_t)^{1/2} Q_t^{-1}.
    """
    c = cov_t.shape[0]
    eye = jnp.eye(c, dtype=cov_t.dtype)
    ct = cov_t + eps * eye
    cs = cov_s + eps * eye

    if mode == "chol":
        lt = jnp.linalg.cholesky(ct)
        ls = jnp.linalg.cholesky(cs)
        # L_s @ inv(L_t) without forming the inverse: solve X L_t = L_s.
        a = jax.lax.linalg.triangular_solve(lt, ls, left_side=False, lower=True)
    elif mode == "pca":
        qt, qt_inv = _psd_sqrt_and_inv(ct)
        qs, _ = _psd_sqrt_and_inv(cs)
        a = jnp.matmul(qs, qt_inv, precision=HIGHEST)
    elif mode == "sym":
        qt, qt_inv = _psd_sqrt_and_inv(ct)
        m = jnp.matmul(jnp.matmul(qt, cs, precision=HIGHEST), qt, precision=HIGHEST)
        msqrt, _ = _psd_sqrt_and_inv(m)
        a = jnp.matmul(jnp.matmul(qt_inv, msqrt, precision=HIGHEST), qt_inv,
                       precision=HIGHEST)
    else:
        raise ValueError(f"unknown moment mode {mode!r}")
    return a


def style_congruence_batch(rotations: jnp.ndarray, cov_s_raw: jnp.ndarray
                           ) -> jnp.ndarray:
    """R_i^T Cov_s R_i for a whole stage's rotation batch at once.

    Inside the OT loops the STYLE side of every iteration is independent of
    the loop carry, so re-expressing the style covariance in each rotated
    basis can leave the serial chain entirely: one batched einsum (pure MXU)
    replaces 2 C x C matmuls per iteration of the sequential fori_loop body.
    """
    return jnp.einsum("nji,jk,nkl->nil", rotations, cov_s_raw, rotations,
                      precision=HIGHEST)


def style_factor_batch(cov_s_rots: jnp.ndarray, mode: str,
                       eps: float = 1.0) -> jnp.ndarray:
    """Precompute the style-side decomposition for every iteration, batched.

    chol: Cholesky factors L_s (batched — TPU cholesky is sequential
    per-matrix, so hoisting it out of the fori_loop shortens each
    iteration's critical path); pca: PSD square roots Q_s (batched
    Newton-Schulz); sym: just the ridged covariance (its expensive factors
    depend on the target side).
    """
    c = cov_s_rots.shape[-1]
    cs = cov_s_rots + eps * jnp.eye(c, dtype=cov_s_rots.dtype)
    if mode == "chol":
        return jnp.linalg.cholesky(cs)
    if mode == "pca":
        return jax.vmap(lambda m: _psd_sqrt_and_inv(m)[0])(cs)
    if mode == "sym":
        return cs
    raise ValueError(f"unknown moment mode {mode!r}")


def moment_transform_pre(cov_t: jnp.ndarray, style_factor: jnp.ndarray,
                         mode: str, eps: float = 1.0) -> jnp.ndarray:
    """:func:`moment_transform` with the style side precomputed
    (:func:`style_factor_batch`); only the target-side work stays in the
    sequential loop body."""
    c = cov_t.shape[0]
    ct = cov_t + eps * jnp.eye(c, dtype=cov_t.dtype)
    if mode == "chol":
        lt = jnp.linalg.cholesky(ct)
        return jax.lax.linalg.triangular_solve(lt, style_factor,
                                               left_side=False, lower=True)
    if mode == "pca":
        _, qt_inv = _psd_sqrt_and_inv(ct)
        return jnp.matmul(style_factor, qt_inv, precision=HIGHEST)
    if mode == "sym":
        qt, qt_inv = _psd_sqrt_and_inv(ct)
        m = jnp.matmul(jnp.matmul(qt, style_factor, precision=HIGHEST), qt,
                       precision=HIGHEST)
        msqrt, _ = _psd_sqrt_and_inv(m)
        return jnp.matmul(jnp.matmul(qt_inv, msqrt, precision=HIGHEST),
                          qt_inv, precision=HIGHEST)
    raise ValueError(f"unknown moment mode {mode!r}")


def moment_match(target: jnp.ndarray, source: jnp.ndarray, mode: str,
                 eps: float = 1.0) -> jnp.ndarray:
    """Full moment matching, NHWC -> NHWC."""
    mu_t, cov_t = moment_stats(target)
    mu_s, cov_s = moment_stats(source)
    a = moment_transform(cov_t, cov_s, mode, eps)
    b, h, w, c = target.shape
    xc = (target - mu_t).reshape(-1, c)
    matched = jnp.matmul(xc, a.T, precision=HIGHEST).reshape(b, h, w, c)
    return matched + mu_s  # mu_s broadcasts over target batch (histmatch.py:44)


# ----------------------------------------------------------------------------
# CDF matching (exact 1-D OT on 256 shared-range bins)

BINS = 256


def interp_ref(x: jnp.ndarray, xp: jnp.ndarray, fp: jnp.ndarray) -> jnp.ndarray:
    """The reference's custom interp (histmatch.py:72-92), branchless.

    idxs = first position with xp[idx] >= x (torch searchsorted right=False);
    linear map on segment [idxs, idxs+1]; falls back to anchoring at
    xp[idxs+1] and finally to fp[idxs] when non-finite (duplicate xp nodes).
    """
    n = xp.shape[0]
    idxs = jnp.clip(jnp.searchsorted(xp, x, side="left"), 0, n - 1)
    idxs_next = jnp.clip(idxs + 1, 0, n - 1)
    xp_i, xp_n = xp[idxs], xp[idxs_next]
    fp_i, fp_n = fp[idxs], fp[idxs_next]
    slopes = (fp_n - fp_i) / (xp_n - xp_i)
    f0 = slopes * (x - xp_i) + fp_i
    f1 = slopes * (x - xp_n) + fp_n
    f = jnp.where(jnp.isfinite(f0), f0, jnp.where(jnp.isfinite(f1), f1, fp_i))
    return f


def _histc(x: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray, bins: int) -> jnp.ndarray:
    """torch.histc semantics: bin = trunc((x-lo)*bins/(hi-lo)), top edge into
    the last bin. All values lie in [lo, hi] by construction here."""
    width = hi - lo
    safe = jnp.where(width > 0, width, 1.0)
    idx = ((x - lo) * bins / safe).astype(jnp.int32)
    idx = jnp.clip(idx, 0, bins - 1)
    return jnp.zeros((bins,), jnp.float32).at[idx].add(1.0)


def _cdf_match_channel(t: jnp.ndarray, s: jnp.ndarray, bins: int) -> jnp.ndarray:
    """One channel: shared-range histograms -> CDFs -> double remap."""
    lo = jnp.minimum(t.min(), s.min())
    hi = jnp.maximum(t.max(), s.max())

    t_hist = _histc(t, lo, hi, bins)
    s_hist = _histc(s, lo, hi, bins)
    bin_edges = jnp.linspace(lo, hi, bins + 1)[1:]

    t_cdf = jnp.cumsum(t_hist)
    t_cdf = t_cdf / t_cdf[-1]
    s_cdf = jnp.cumsum(s_hist)
    s_cdf = s_cdf / s_cdf[-1]

    remapped = interp_ref(t_cdf, s_cdf, bin_edges)
    return interp_ref(t, bin_edges, remapped)


def _cdf_apply_channel(t, t_hist, s_hist, lo, hi, bins):
    """Apply CDF matching given precomputed per-channel histograms."""
    bin_edges = jnp.linspace(lo, hi, bins + 1)[1:]
    t_cdf = jnp.cumsum(t_hist)
    t_cdf = t_cdf / t_cdf[-1]
    s_cdf = jnp.cumsum(s_hist)
    s_cdf = s_cdf / s_cdf[-1]
    remapped = interp_ref(t_cdf, s_cdf, bin_edges)
    return interp_ref(t, bin_edges, remapped)


# ----------------------------------------------------------------------------
# Fast cdf path: gather-free, arithmetic bin indices (round 4)
#
# The legacy per-sample remap costs ~6 VPU passes of N x 256 (compare-count
# searchsorted + one-hot multiply-reduce table lookups); this path exploits
# that the second interp's xp table (bin right-edges) is UNIFORM, so the
# searchsorted collapses to O(1) arithmetic per sample, and the remaining
# table lookups factor through 16 x 16 one-hots (the 256-wide one-hot never
# materializes). Numerics: identical to the legacy path except that samples
# within ~1 ulp of a bin edge may resolve to the adjacent segment — the PWL
# map is continuous at its nodes, so values agree to float noise (the
# reference's cdf mode is itself documented as chaotic at pass granularity).


def _shift_rows(v: jnp.ndarray) -> jnp.ndarray:
    """v[:, i] -> v[:, min(i+1, B-1)] (the reference's clipped idx_next)."""
    return jnp.concatenate([v[:, 1:], v[:, -1:]], axis=1)


def _edges_rows(lo: jnp.ndarray, hi: jnp.ndarray, bins: int) -> jnp.ndarray:
    """(C,) ranges -> (C, bins) right bin edges (linspace semantics,
    histmatch.py:60)."""
    return jax.vmap(lambda l, h: jnp.linspace(l, h, bins + 1)[1:])(lo, hi)


def _remap_table_rows(t_cdf: jnp.ndarray, s_cdf: jnp.ndarray,
                      edges: jnp.ndarray) -> jnp.ndarray:
    """remapped[c] = interp_ref(t_cdf[c]; xp=s_cdf[c], fp=edges[c]) for every
    channel at once, gather-free: compare-count searchsorted (xp is NOT
    uniform here, but there are only 256 queries per channel) + one-hot
    table contraction. Bit-identical to vmapped interp_ref: the one-hot
    einsum selects exactly one f32 value per query."""
    bins = t_cdf.shape[1]
    idx = jnp.minimum(jnp.sum(s_cdf[:, None, :] < t_cdf[:, :, None], axis=2),
                      bins - 1)                                   # (C, B)
    tabs = jnp.stack([s_cdf, _shift_rows(s_cdf),
                      edges, _shift_rows(edges)], axis=2)         # (C, B, 4)
    ids = jnp.arange(bins, dtype=idx.dtype)
    oh = (idx[:, :, None] == ids).astype(jnp.float32)             # (C, B, B)
    vals = jnp.einsum("cqb,cbk->cqk", oh, tabs, precision=HIGHEST)
    xp_i, xp_n, fp_i, fp_n = (vals[..., 0], vals[..., 1],
                              vals[..., 2], vals[..., 3])
    slope = (fp_n - fp_i) / (xp_n - xp_i)
    f0 = slope * (t_cdf - xp_i) + fp_i
    f1 = slope * (t_cdf - xp_n) + fp_n
    return jnp.where(jnp.isfinite(f0), f0,
                     jnp.where(jnp.isfinite(f1), f1, fp_i))


def _pwl_bin_index(t: jnp.ndarray, lo: jnp.ndarray, step_safe: jnp.ndarray,
                   bins: int) -> jnp.ndarray:
    """Arithmetic equivalent of searchsorted(bin_edges, x, 'left') for the
    UNIFORM edge table: #(edges < x) with edges[j] = lo + (j+1)*step."""
    u = (t - lo[:, None]) / step_safe[:, None]
    return jnp.clip(jnp.ceil(u).astype(jnp.int32) - 1, 0, bins - 1)


def _pwl_apply_rows(t: jnp.ndarray, remapped: jnp.ndarray, lo: jnp.ndarray,
                    hi: jnp.ndarray) -> jnp.ndarray:
    """Second interp of the cdf remap: out = interp_ref(t; bin_edges,
    remapped) per channel — XLA formulation (fused one-hot lookups; the
    Pallas kernel in ops/pallas/pwl_remap.py is the TPU-optimized twin)."""
    bins = remapped.shape[1]
    width = hi - lo
    step = width / bins
    step_safe = jnp.where(step > 0, step, 1.0)
    j = _pwl_bin_index(t, lo, step_safe, bins)                    # (C, N)

    ids = jnp.arange(bins, dtype=j.dtype)
    oh = j[:, :, None] == ids                                     # fused
    fp_i = jnp.sum(jnp.where(oh, remapped[:, None, :], 0.0), axis=2)
    rnext = _shift_rows(remapped)
    fp_n = jnp.sum(jnp.where(oh, rnext[:, None, :], 0.0), axis=2)

    xp_i = lo[:, None] + (j + 1).astype(t.dtype) * step[:, None]
    xp_n = lo[:, None] + jnp.minimum(j + 2, bins).astype(t.dtype) * step[:, None]
    slope = (fp_n - fp_i) / (xp_n - xp_i)
    f = slope * (t - xp_i) + fp_i
    # j == bins-1: xp_n == xp_i -> the reference's non-finite fallback chain
    # lands on fp_i (the whole last bin maps to remapped[-1])
    f = jnp.where(j >= bins - 1, fp_i, f)
    # degenerate shared range (constant channel): searchsorted gives idx 0
    # and the fallback lands on remapped[0]
    return jnp.where((width > 0)[:, None], f, remapped[:, :1])


def cdf_cdfs_rows(t_hist: jnp.ndarray, s_hist: jnp.ndarray):
    """Histogram counts -> normalized CDFs (reference op order)."""
    t_cdf = jnp.cumsum(t_hist, axis=1)
    t_cdf = t_cdf / t_cdf[:, -1:]
    s_cdf = jnp.cumsum(s_hist, axis=1)
    s_cdf = s_cdf / s_cdf[:, -1:]
    return t_cdf, s_cdf


def histogram_rows(x: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
                   bins: int = BINS,
                   use_pallas: bool | None = None) -> jnp.ndarray:
    """(C, N) samples + per-channel ranges -> (C, bins) float32 counts with
    torch.histc binning. Pallas kernel on TPU (one launch, VPU one-hot
    accumulate), fused one-hot reduction elsewhere (exact; XLA fuses the
    (C, N, bins) compare into the sum — scatter-add would serialize)."""
    if _pallas_auto(use_pallas) and bins == BINS:
        from .pallas.histogram import batched_histogram

        return batched_histogram(x, lo, hi)
    width = hi - lo
    safe = jnp.where(width > 0, width, 1.0)
    idx = ((x - lo[:, None]) * bins / safe[:, None]).astype(jnp.int32)
    idx = jnp.clip(idx, 0, bins - 1)
    ids = jnp.arange(bins, dtype=jnp.int32)
    return jnp.sum((idx[:, :, None] == ids).astype(jnp.float32), axis=1)


def cdf_apply_rows(t: jnp.ndarray, t_hist: jnp.ndarray, s_hist: jnp.ndarray,
                   lo: jnp.ndarray, hi: jnp.ndarray,
                   use_pallas: bool | None = None) -> jnp.ndarray:
    """Apply cdf matching to (C, N) target rows given per-channel histograms
    on the shared range. The tiny table work (cdfs + cdf->cdf remap) always
    runs in XLA; the per-sample PWL evaluation uses the Pallas kernel on TPU
    and the fused-one-hot XLA twin elsewhere. The DISTRIBUTED cdf step psums
    t_hist between histogram_rows and this call — both halves are pure
    functions of the (already-global) histograms."""
    bins = t_hist.shape[1]
    t_cdf, s_cdf = cdf_cdfs_rows(t_hist, s_hist)
    edges = _edges_rows(lo, hi, bins)
    remapped = _remap_table_rows(t_cdf, s_cdf, edges)
    if _pallas_auto(use_pallas) and bins == BINS:
        from .pallas.pwl_remap import pwl_remap

        return pwl_remap(t, remapped, lo, hi)
    return _pwl_apply_rows(t, remapped, lo, hi)


def _pallas_auto(use_pallas: bool | None) -> bool:
    if use_pallas is None:
        import os

        return (jax.default_backend() in ("tpu", "axon")
                and os.environ.get("OPTEX_NO_PALLAS") != "1")
    return bool(use_pallas)


def cdf_match_rows(t: jnp.ndarray, s: jnp.ndarray, bins: int = BINS,
                   use_pallas: bool | None = None) -> jnp.ndarray:
    """Row-major cdf matching core: t (C, Nt) matched to s (C, Ns)."""
    lo = jnp.minimum(t.min(axis=1), s.min(axis=1))
    hi = jnp.maximum(t.max(axis=1), s.max(axis=1))
    t_hist = histogram_rows(t, lo, hi, bins, use_pallas)
    s_hist = histogram_rows(s, lo, hi, bins, use_pallas)
    return cdf_apply_rows(t, t_hist, s_hist, lo, hi, use_pallas)


def cdf_match(target: jnp.ndarray, source: jnp.ndarray, bins: int = BINS,
              use_pallas: bool | None = None) -> jnp.ndarray:
    """CDF matching, NHWC -> NHWC, all channels at once.

    The fast gather-free path (arithmetic bin indices + factored lookups) is
    the default everywhere since r4 — on TPU its per-sample stage runs as
    Pallas kernels, elsewhere as fused XLA. ``bins != 256`` falls back to
    the legacy vmapped searchsorted/gather implementation (kept as the
    golden oracle in tests)."""
    bt, h, w, c = target.shape
    t = target.reshape(-1, c).T  # (C, Nt)
    s = source.reshape(-1, c).T  # (C, Ns)
    if bins != BINS:
        matched = jax.vmap(partial(_cdf_match_channel, bins=bins))(t, s)
    else:
        matched = cdf_match_rows(t, s, bins, use_pallas)
    return matched.T.reshape(bt, h, w, c)


# ----------------------------------------------------------------------------
# Sort matching: exact sliced 1-D optimal transport (TPU-native extension)


def sort_match(target: jnp.ndarray, source: jnp.ndarray) -> jnp.ndarray:
    """Exact per-channel 1-D OT via order statistics, NHWC -> NHWC.

    The cdf mode approximates the 1-D transport map with 256 bins (a
    torch.histc legacy); the exact map sends the r-th smallest target sample
    to the source's (r+0.5)/Nt quantile. No histograms, no interpolation
    error. Not in the reference; exposed as hist_mode="sort".

    TPU cost shape: the whole map is TWO stable multi-operand sorts + one
    STATIC gather. The source index depends only on the RANK, never the
    data (``q(r) = clip((r+0.5)*Ns/Nt)``), so the quantile lookup indexes
    ``s_sorted`` with a host-constant vector; and the inverse permutation
    that scatters matched values back to their original positions IS a sort
    by original index — no argsort-of-argsort, no dynamic gather (slow on
    TPU).
    """
    bt, h, w, c = target.shape
    t = target.reshape(-1, c).T  # (C, Nt)
    s = source.reshape(-1, c).T  # (C, Ns)
    return sort_match_rows(t, s).T.reshape(bt, h, w, c)


# Above this many elements in the larger of the two (C, N) sample clouds the
# per-channel sorts run in channel blocks through lax.map so the multi-operand
# sort buffers stay bounded (a monolithic batch-32 512px sort cloud — ~700M
# elements with its iota/value operands — faulted the device at compile).
# The 192M default keeps the historical batch<=8 shapes on the one-program
# path. None = resolve OPTEX_SORT_BLOCK_ELEMS at call/trace time through
# config.sort_block_elems() (the unified knob-latching rule — config.py owns
# the story); set this attribute to pin a value (tests do).
_SORT_BLOCK_ELEMS = None


def sort_match_rows(t: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Row-major core of :func:`sort_match`: t (C, Nt) matched to s (C, Ns)
    per row, returned in t's original sample order. Also the building block
    of the DISTRIBUTED sort mode (parallel/shard_ot._sort_step_sharded),
    which all-gathers the sample axis and slices its shard back out.

    Clouds past the block threshold (config.sort_block_elems, or the
    ``_SORT_BLOCK_ELEMS`` override) process channel blocks sequentially
    (lax.map): rows are independent, so the math is identical — it only
    bounds the live sort-buffer footprint (the capacity story of
    --batch_chunk, applied to the sample-cloud modes). Both the gate and
    the block size count the LARGER of the two clouds: each block's live
    buffers hold rows*Nt target AND rows*Ns source elements, so an
    ns >> nt style (large style, small target) must trigger blocking and
    shrink the rows just like a large target does (ADVICE r4)."""
    from .. import config as _config

    c, nt = t.shape
    ns = s.shape[1]
    cap = (_SORT_BLOCK_ELEMS if _SORT_BLOCK_ELEMS is not None
           else _config.sort_block_elems())
    m = max(nt, ns, 1)
    if c > 1 and c * m > cap:
        rows = max(1, cap // m)
        nblk = -(-c // rows)
        pad = nblk * rows - c
        tb = jnp.pad(t, ((0, pad), (0, 0))).reshape(nblk, rows, nt)
        sb = jnp.pad(s, ((0, pad), (0, 0))).reshape(nblk, rows, s.shape[1])
        out = jax.lax.map(lambda ts: _sort_match_rows_impl(ts[0], ts[1]),
                          (tb, sb))
        return out.reshape(nblk * rows, nt)[:c]
    return _sort_match_rows_impl(t, s)


def _sort_match_rows_impl(t: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    import numpy as np

    nt, ns = t.shape[1], s.shape[1]
    s_sorted = jnp.sort(s, axis=1)
    iota = jnp.broadcast_to(jnp.arange(nt, dtype=jnp.int32), t.shape)
    _, order = jax.lax.sort((t, iota), dimension=1, num_keys=1,
                            is_stable=True)
    src_idx = np.clip(((np.arange(nt) + 0.5) * (ns / nt)).astype(np.int64),
                      0, ns - 1)
    matched_sorted = s_sorted[:, src_idx]          # static gather
    _, out = jax.lax.sort((order, matched_sorted), dimension=1, num_keys=1,
                          is_stable=True)
    return out


# ----------------------------------------------------------------------------
# Unified entry, reference signature


def hist_match(target: jnp.ndarray, source: jnp.ndarray, mode: str = "chol",
               eps: float = 1.0) -> jnp.ndarray:
    """NHWC target matched to NHWC source's per-channel statistics."""
    if mode == "cdf":
        return cdf_match(target, source)
    if mode == "sort":
        return sort_match(target, source)
    return moment_match(target, source, mode, eps)

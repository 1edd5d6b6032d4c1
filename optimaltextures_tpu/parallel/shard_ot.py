"""Sharded sliced optimal transport: exact multi-chip data parallelism.

The reference is strictly single-device (SURVEY §2.2). The natural multi-chip
axis of this workload is the SAMPLE axis of the OT statistics: a batch of
pastiches (or the rows of one huge image) can be sharded across devices while
keeping the reference's *joint* matching semantics, because everything the
transport step needs from the sample cloud is:

* per-(batch-element, channel) means — local to a batch shard, and
* the pooled C x C covariance — an (all-)reduction of per-shard partial sums.

So each device computes its local centered Gram matrix, a single ``psum``
over ICI produces the exact global covariance, every device derives the same
C x C transform (replicated tiny compute), and applies it to its local
samples. Rotations use the same folded key on every device — identical by
construction, no broadcast needed. Numerics match the single-device path to
float tolerance, so this is "free" scaling: no algorithm drift.

Convolution encode/decode under batch sharding is trivially parallel (XLA
just partitions the batch dim); :func:`make_sharded_pass` jits ALL of a
pass's (encode -> OT loop -> decode) stages as one program over the mesh
(the per-layer stage builders were folded into it in r4 — a single-layer
pass IS a layer stage).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .. import transport
from ..models import fastcodec
from ..models.vgg import decode, encode
from ..ops import histmatch
from ..ops.rotation import random_rotation, stage_rotations

HIGHEST = jax.lax.Precision.HIGHEST


def _local_moments(x: jnp.ndarray):
    """Per-shard contributions: per-element means (local) and the centered
    Gram partial sum + sample count (to be psum'd)."""
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    xc = (x - mu).reshape(-1, x.shape[-1])
    gram = jnp.matmul(xc.T, xc, precision=HIGHEST)
    return mu, xc, gram, xc.shape[0]


def _moment_step_sharded(rot, feature, style_mu, style_cov_raw, mode: str,
                         axis: str, eps: float = 1.0, sfactor=None):
    """One sliced-OT step inside shard_map: feature is the LOCAL batch shard;
    the covariance is psum'd so matching is joint across the global batch.
    ``sfactor`` supplies the precomputed style-side decomposition (see
    histmatch.style_factor_batch) when called from the loop."""
    c = feature.shape[-1]
    mu_t, xc, gram, n_local = _local_moments(feature)
    gram = jax.lax.psum(gram, axis)
    n_total = n_local * jax.lax.psum(1, axis)
    cov_t_raw = gram / n_total

    cov_t_rot = rot.T @ (cov_t_raw @ rot)
    if sfactor is None:
        cov_s_rot = rot.T @ (style_cov_raw @ rot)
        a = histmatch.moment_transform(cov_t_rot, cov_s_rot, mode, eps)
    else:
        a = histmatch.moment_transform_pre(cov_t_rot, sfactor, mode, eps)
    m = rot @ (a.T @ rot.T)

    b, h, w, _ = feature.shape
    out = jnp.matmul(xc, m, precision=HIGHEST).reshape(b, h, w, c)
    return out + style_mu


def ot_step_moment_sharded(key, feature, style_mu, style_cov_raw, mode: str,
                           axis: str, eps: float = 1.0):
    rot = random_rotation(key, feature.shape[-1])  # same key everywhere
    return _moment_step_sharded(rot, feature, style_mu, style_cov_raw, mode,
                                axis, eps)


def _cdf_step_sharded(rot, feature, style_samples, axis: str):
    """Sharded cdf matching: lo/hi and the target histogram reduce over the
    mesh (pmin/pmax + psum), so the 256-bin CDF is the exact global one; the
    remap then applies locally. Style samples are replicated.

    Uses the same fast gather-free primitives as the single-device loop
    (histmatch.histogram_rows / cdf_apply_rows, r4) — per-shard counts are
    exact integers in float32, so the psum'd histogram is bit-identical to
    the single-device one and the sharded outputs stay exactly equal."""
    c = feature.shape[-1]
    b, h, w, _ = feature.shape
    rf = jnp.matmul(feature.reshape(-1, c), rot, precision=HIGHEST)
    rs = jnp.matmul(style_samples, rot, precision=HIGHEST)

    t = rf.T  # (C, N_local)
    s = rs.T
    lo = jnp.minimum(jax.lax.pmin(t.min(axis=1), axis), s.min(axis=1))
    hi = jnp.maximum(jax.lax.pmax(t.max(axis=1), axis), s.max(axis=1))

    t_hist = histmatch.histogram_rows(t, lo, hi)
    t_hist = jax.lax.psum(t_hist, axis)  # exact global target histogram
    s_hist = histmatch.histogram_rows(s, lo, hi)

    matched = histmatch.cdf_apply_rows(t, t_hist, s_hist, lo, hi)
    out = jnp.matmul(matched.T, rot.T, precision=HIGHEST)
    return out.reshape(b, h, w, c)


def _sort_step_sharded(rot, feature, style_samples, axis: str):
    """EXACT distributed sort matching (global order statistics across
    shards), lifting the r2 restriction that `sort` degraded to per-shard
    semantics under DP and was rejected under SP (VERDICT r2 missing #3).

    Each device all-gathers the rotated sample slices over ICI — the
    gathered matrix is (C, N_total), concatenated in shard order, which IS
    the single-device flatten order for both batch sharding (shard i holds
    batch rows i*b/n..) and H sharding (shard i holds row block i) — runs
    the exact rank -> style-quantile map on the full cloud, and slices its
    own samples back out by axis_index. Cost shape: one all_gather of the
    sample axis + a redundant full-cloud sort per device; exact semantics
    are the point — for clouds too big to gather, cdf mode's psum'd
    histograms are the scalable approximation (histmatch.py:49-69's intent,
    made exact here at gatherable sizes).
    """
    c = feature.shape[-1]
    b, h, w, _ = feature.shape
    n_local = b * h * w
    rf = jnp.matmul(feature.reshape(-1, c), rot, precision=HIGHEST).T
    rs = jnp.matmul(style_samples, rot, precision=HIGHEST).T
    t_all = jax.lax.all_gather(rf, axis, axis=1, tiled=True)  # (C, N_total)
    matched_all = histmatch.sort_match_rows(t_all, rs)
    idx = jax.lax.axis_index(axis)
    ours = jax.lax.dynamic_slice_in_dim(matched_all, idx * n_local, n_local,
                                        axis=1)
    out = jnp.matmul(ours.T, rot.T, precision=HIGHEST)
    return out.reshape(b, h, w, c)


def _sort_step_grid(rot, feature, style_samples, data_axis: str,
                    space_axis: str):
    """EXACT distributed sort on the 2-D (batch x height) grid (VERDICT r3
    next-step #7 — previously rejected).

    The single-device flatten order of a (B, H, W) batch is image-major:
    index = (b*H + h)*W + w. A grid shard holds (b_loc, h_loc, W); a plain
    tiled all_gather over both axes would concatenate SHARD blocks, which
    interleaves wrongly (every image's rows are split across the space
    ring). The order IS recoverable in two steps: gather the space ring
    with a fresh axis, transpose it under each image's row block (so every
    image's H rows become contiguous, shard-ring-ordered = top-to-bottom),
    then a tiled gather over data concatenates whole-image blocks in batch
    order — exactly the single-device flatten order. The exact rank ->
    style-quantile map runs on the full cloud and each device slices its
    own (data_idx, space_idx) block back out. Cost shape matches the 1-D
    sort: one full-cloud gather + a redundant full sort per device (the
    exactness-over-scalability trade documented there)."""
    c = feature.shape[-1]
    b, h, w, _ = feature.shape                      # LOCAL shard dims
    hw = h * w
    rf = jnp.matmul(feature.reshape(-1, c), rot, precision=HIGHEST).T
    rs = jnp.matmul(style_samples, rot, precision=HIGHEST).T

    g = jax.lax.all_gather(rf, space_axis, axis=1, tiled=False)  # (C,ds,N_l)
    ds = g.shape[1]
    g = g.reshape(c, ds, b, hw).transpose(0, 2, 1, 3)            # (C,b,ds,hw)
    g = g.reshape(c, b * ds * hw)                   # whole images, row order
    t_all = jax.lax.all_gather(g, data_axis, axis=1, tiled=True)

    matched_all = histmatch.sort_match_rows(t_all, rs)

    db = matched_all.shape[1] // (b * ds * hw)
    di = jax.lax.axis_index(data_axis)
    si = jax.lax.axis_index(space_axis)
    blocks = matched_all.reshape(c, db, b, ds, hw)
    ours = jax.lax.dynamic_slice(
        blocks, (0, di, 0, si, 0), (c, 1, b, 1, hw)).reshape(c, b * hw)
    out = jnp.matmul(ours.T, rot.T, precision=HIGHEST)
    return out.reshape(b, h, w, c)


def sharded_transport_loop_axes(key, feature, style_mu, style_cov_raw,
                                n_iters: int, mode: str, *,
                                mean_axes, gram_axes, sort_axis=None,
                                style_samples=None, content_feature=None,
                                content_strength: float = 0.0,
                                k_mask=None, cov_prop=None):
    """THE sharded OT loop, one implementation for every mesh layout
    (batch-DP, spatial SP, and the 2-D batch x height grid are thin
    wrappers — they previously carried three hand-synced copies of this
    body, review r3):

    * ``mean_axes``: mesh axes the per-(image, channel) means reduce over
      (empty = batch-DP semantics: means stay local to each image shard);
    * ``gram_axes``: axes the pooled covariance Gram — and cdf mode's
      range/histograms — psum over (the joint-statistics axes);
    * ``sort_axis``: the axis the exact distributed sort gathers over — a
      single axis name (1-D layouts, shard order == flatten order), or a
      ``(data_axis, space_axis)`` tuple for the 2-D grid (flatten order
      recovered by the two-step gather in :func:`_sort_step_grid`); None
      rejects sort on this layout with a clear error.
    """
    if n_iters == 0:
        return feature
    if mode == "sort" and sort_axis is None:
        raise ValueError(
            "sort is unsupported on this mesh layout — no gather order is "
            "defined for it; use a 1-D mesh or the 2-D grid, or cdf here")

    c = feature.shape[-1]
    # same batched polar rotation stream as the single-device loop (identical
    # key -> identical rotations on every shard, no broadcast needed)
    if k_mask is not None:
        from ..ops.rotation import stage_rotations_masked

        rotations = stage_rotations_masked(key, n_iters, c, k_mask)
    else:
        rotations = stage_rotations(key, n_iters, c)

    moment_mode = mode not in ("cdf", "sort")
    if moment_mode:
        # style side is carry-independent: congruence + decomposition batch
        # out of the loop (see transport.transport_loop); replicated inputs,
        # so this adds no collectives
        cov_s_rots = histmatch.style_congruence_batch(rotations, style_cov_raw)
        sfactors = histmatch.style_factor_batch(cov_s_rots, mode, 1.0)

    def moments(x):
        if mean_axes:
            ns = jax.lax.psum(1, mean_axes)
            mean = jax.lax.psum(jnp.sum(x, axis=(1, 2), keepdims=True),
                                mean_axes) / (x.shape[1] * x.shape[2] * ns)
        else:
            mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        xc = (x - mean).reshape(-1, c)
        gram = jax.lax.psum(jnp.matmul(xc.T, xc, precision=HIGHEST),
                            gram_axes)
        n_total = xc.shape[0] * jax.lax.psum(1, gram_axes)
        return mean, xc, gram / n_total

    use_prop = ((cov_prop if cov_prop is not None else True)
                and transport.cov_propagation_enabled())
    if moment_mode and use_prop:
        # Composed closed-form path (see transport.compose_moment_chain):
        # the joint statistics are psum'd ONCE, the whole stage's iterations
        # fold into one affine map via a replicated C x C scan (identical
        # stats + rotations on every shard -> identical map, no broadcast),
        # and each shard applies it to its local samples with ONE GEMM.
        # Collective-free after the initial psums; the per-iteration sample
        # GEMM of the old loop disappears entirely.
        mu0, _, cov0 = moments(feature)
        b, h, w, _ = feature.shape
        # mu0 can be shard-varying (per-image local means) — the composed
        # bias stays per-image the same way; derive mu_s with its shape
        if content_feature is not None and content_strength != 0.0:
            mu_cf, _, cov_cf = moments(content_feature)
            fc = (feature - mu0).reshape(-1, c)
            cc = (content_feature - mu_cf).reshape(-1, c)
            cross_gram = jax.lax.psum(
                jnp.matmul(fc.T, cc, precision=HIGHEST), gram_axes)
            cross0 = cross_gram / (fc.shape[0] * jax.lax.psum(1, gram_axes))
            A, Bc, bias = transport.compose_moment_chain(
                rotations, sfactors, mu0, cov0, style_mu, mode, 1.0,
                content_strength, cross0, cov_cf, mu_cf)
            out = (jnp.matmul(feature.reshape(-1, c), A, precision=HIGHEST)
                   + jnp.matmul(content_feature.reshape(-1, c), Bc,
                                precision=HIGHEST)).reshape(b, h, w, c)
            return out + bias
        A, _, bias = transport.compose_moment_chain(
            rotations, sfactors, mu0, cov0, style_mu, mode, 1.0)
        out = jnp.matmul(feature.reshape(-1, c), A,
                         precision=HIGHEST).reshape(b, h, w, c)
        return out + bias

    def body(i, feat):
        rot = rotations[i]
        if mode == "cdf":
            feat = _cdf_step_sharded(rot, feat, style_samples, gram_axes)
        elif mode == "sort":
            if isinstance(sort_axis, tuple):
                feat = _sort_step_grid(rot, feat, style_samples, *sort_axis)
            else:
                feat = _sort_step_sharded(rot, feat, style_samples,
                                          sort_axis)
        else:
            mu_t, xc, cov_t_raw = moments(feat)
            cov_t_rot = rot.T @ (cov_t_raw @ rot)
            a = histmatch.moment_transform_pre(cov_t_rot, sfactors[i], mode,
                                               1.0)
            m = rot @ (a.T @ rot.T)
            b, h, w, _ = feat.shape
            feat = jnp.matmul(xc, m,
                              precision=HIGHEST).reshape(b, h, w, c) + style_mu
        if content_feature is not None:
            feat = feat + content_strength * (content_feature - feat)
        return feat

    return jax.lax.fori_loop(0, n_iters, body, feature)


def sharded_transport_loop(key, feature, style_mu, style_cov_raw, n_iters: int,
                           mode: str, axis: str,
                           style_samples: Optional[jnp.ndarray] = None,
                           content_feature: Optional[jnp.ndarray] = None,
                           content_strength: float = 0.0,
                           k_mask: Optional[jnp.ndarray] = None,
                           cov_prop: Optional[bool] = None):
    """Batch-DP layout: means local to each image shard, Gram psum'd over
    the batch axis (joint covariance), sort gathers over the batch axis."""
    return sharded_transport_loop_axes(
        key, feature, style_mu, style_cov_raw, n_iters, mode,
        mean_axes=(), gram_axes=(axis,), sort_axis=axis,
        style_samples=style_samples, content_feature=content_feature,
        content_strength=content_strength, k_mask=k_mask, cov_prop=cov_prop)


def _chunked_stage_local(enc_p, dec_p, pastiche, style_mu, style_cov_raw,
                         eigvecs, key, k_mask, *, depth: int, n_iters: int,
                         mode: str, pca_flag: bool, n_chunks: int, axis: str,
                         pad_mode: str, conv_dtype):
    """One stage of the DP pass with the LOCAL batch shard micro-batched
    through the conv codec (the shard_map body of batch_chunk x DP). Encode
    + project chunk-by-chunk under ``lax.map`` so only one chunk's conv
    intermediates live at a time, psum the joint (per-image-mean-centered)
    covariance over the mesh ONCE, build the composed stage map from the
    GLOBAL statistics (same rotations on every shard — identical map, no
    broadcast), and apply + unproject + decode chunk-by-chunk. Exactly the
    single-device chunked math (core._pass_stages_chunked_impl) with the
    Gram/count reductions widened by a psum."""
    b_loc = pastiche.shape[0]

    def enc_chunk(img):
        f = encode(enc_p, depth, img, pad_mode).astype(jnp.float32)
        if pca_flag:
            f = jnp.matmul(f, eigvecs, precision=HIGHEST)
        return f

    chunks = pastiche.reshape(n_chunks, b_loc // n_chunks, *pastiche.shape[1:])
    feats = jax.lax.map(enc_chunk, chunks)
    nc, bc, h, w, c = feats.shape
    x = feats.reshape(b_loc, h, w, c)
    mu0 = jnp.mean(x, axis=(1, 2), keepdims=True)   # per-image, shard-local
    xc = (x - mu0).reshape(-1, c)
    gram = jax.lax.psum(jnp.matmul(xc.T, xc, precision=HIGHEST), axis)
    cov0 = gram / (xc.shape[0] * jax.lax.psum(1, axis))
    A, bias = transport.stage_affine_map(
        key, mu0, cov0, transport.StyleStats(style_mu, style_cov_raw, None),
        n_iters, mode, k_mask=k_mask)
    bias_chunks = bias.reshape(nc, bc, 1, 1, c)

    def dec_chunk(args):
        f, bias_c = args
        out = jnp.matmul(f.reshape(-1, f.shape[-1]), A,
                         precision=HIGHEST).reshape(f.shape) + bias_c
        if pca_flag:
            out = jnp.matmul(out, eigvecs.T, precision=HIGHEST)
        return decode(dec_p, depth, out.astype(conv_dtype), pad_mode)

    out_chunks = jax.lax.map(dec_chunk, (feats, bias_chunks))
    return out_chunks.reshape(b_loc, *out_chunks.shape[2:])


def make_sharded_pass(mesh: Mesh, *, depths, iters, mode: str, strengths,
                      pca_flags, axis: str = "data",
                      pad_mode: str = "reflect", cov_prop=None,
                      n_chunks: int = 1, fast_codec: bool = False):
    """ALL of a pass's layer stages in ONE shard_map program, mirroring the
    single-device ``core._pass_stages_impl``: per depth (deepest first)
    encode -> project -> sharded OT loop -> unproject -> decode, the decoded
    image feeding the next stage directly on-device. One dispatch + one
    device_put per pass instead of one of each per layer — on the 1-core
    host, per-layer dispatch gaps dominated the sharded paths (VERDICT r2
    weak #3; docs/PERF.md finding #2 applied to the DP/SP paths).

    Returns fn(enc_list, dec_list, pastiche_f32, mus, covs, samples,
    eigvecs, contents, key, k_masks) -> pastiche_f32, where the per-layer
    values arrive as tuples (None entries allowed). Pastiche is
    batch-sharded and donated; everything else is replicated (batch-DP
    content is None by construction — the reference ignores --batch with
    content, optex.py:263).

    ``n_chunks > 1`` composes DP with ``batch_chunk`` (the per-chip HBM
    capacity knob, core._pass_stages_chunked_impl): each device micro-
    batches its LOCAL batch shard through the conv codec under ``lax.map``
    while the stage's joint covariance still psums ONCE over the mesh, so
    the composed affine map stays exact across the GLOBAL batch. Moment
    modes with cov_propagation and no content only (the config gate
    enforces this).

    ``fast_codec`` routes each device's LOCAL codec section through the
    Pallas relu1-scale kernels (models/fastcodec.py), exactly mirroring
    the single-device ``core._pass_stages_impl`` fast branch: the codec is
    shard-local (no collectives touch it), so a DP run whose PER-DEVICE
    batch is the kernels' 128-lane width runs the codec at the measured
    single-chip Pallas rate on every chip while the OT statistics still
    psum once over the mesh. Gated by the caller (core.run(): local batch
    (or, with n_chunks > 1, the local CHUNK) == 128, bf16, reflect, all
    visited sizes %32). With ``n_chunks > 1`` the fast branch micro-batches
    each device's shard through the kernels under ``lax.map`` — the
    batch_chunk x DP math of :func:`_chunked_stage_local` (psum'd joint
    moments -> composed stage map) with the Pallas heads/tails, chunks
    living as post-renorm padded-RGB TCB across the pass's stages.
    """
    shard = P(axis, None, None, None)
    rep = P()

    def pass_local(enc_list, dec_list, pastiche, mus, covs, samples,
                   eigvecs, contents, key, k_masks):
        conv_dtype = enc_list[0][0][0].dtype
        pastiche = pastiche.astype(conv_dtype)

        def ot_local(i, feat):
            feat = feat.astype(jnp.float32)
            if pca_flags[i]:
                feat = jnp.matmul(feat, eigvecs[i], precision=HIGHEST)
            feat = sharded_transport_loop(
                jax.random.fold_in(key, i), feat, mus[i], covs[i],
                iters[i], mode, axis, style_samples=samples[i],
                content_feature=contents[i], content_strength=strengths[i],
                k_mask=k_masks[i], cov_prop=cov_prop)
            if pca_flags[i]:
                feat = jnp.matmul(feat, eigvecs[i].T, precision=HIGHEST)
            return feat

        if fast_codec and n_chunks > 1:
            # batch_chunk x DP x fast_codec: each 128-image chunk of the
            # local shard rides the Pallas kernels under lax.map; the
            # joint moments psum over the mesh and the composed stage map
            # applies per chunk (_chunked_stage_local's math with the
            # fastcodec heads/tails)
            b_loc = pastiche.shape[0]
            chunks = pastiche.reshape(n_chunks, b_loc // n_chunks,
                                      *pastiche.shape[1:])
            rgb8 = jax.lax.map(
                lambda img: fastcodec.pixels_to_rgb8(enc_list[0][0], img),
                chunks)
            for i, d in enumerate(depths):

                def enc_fast(r, _i=i, _d=d):
                    f = fastcodec.encode_head(
                        enc_list[_i], _d, r, conv_dtype).astype(jnp.float32)
                    if pca_flags[_i]:
                        f = jnp.matmul(f, eigvecs[_i], precision=HIGHEST)
                    return f

                feats = jax.lax.map(enc_fast, rgb8)
                nc, bc, h, w, c = feats.shape
                x = feats.reshape(b_loc, h, w, c)
                mu0 = jnp.mean(x, axis=(1, 2), keepdims=True)
                xc = (x - mu0).reshape(-1, c)
                gram = jax.lax.psum(
                    jnp.matmul(xc.T, xc, precision=HIGHEST), axis)
                cov0 = gram / (xc.shape[0] * jax.lax.psum(1, axis))
                A, bias = transport.stage_affine_map(
                    jax.random.fold_in(key, i), mu0, cov0,
                    transport.StyleStats(mus[i], covs[i], None), iters[i],
                    mode, k_mask=k_masks[i])
                bias_chunks = bias.reshape(nc, bc, 1, 1, c)
                renorm = (enc_list[i + 1][0]
                          if i + 1 < len(depths) else None)

                def dec_fast(args, _i=i, _d=d, _renorm=renorm, _A=A):
                    f, bias_c = args
                    out = jnp.matmul(f.reshape(-1, f.shape[-1]), _A,
                                     precision=HIGHEST
                                     ).reshape(f.shape) + bias_c
                    if pca_flags[_i]:
                        out = jnp.matmul(out, eigvecs[_i].T,
                                         precision=HIGHEST)
                    return fastcodec.decode_tail(
                        dec_list[_i], _d, out.astype(conv_dtype), _renorm,
                        conv_dtype)

                rgb8 = jax.lax.map(dec_fast, (feats, bias_chunks))
            px = jax.lax.map(
                lambda r: fastcodec.rgb8_to_pixels(r, jnp.float32), rgb8)
            return px.reshape(b_loc, *px.shape[2:])

        if fast_codec:
            # shard-local Pallas codec: the image lives as post-renorm
            # padded-RGB TCB between stages, as in the single-device fast
            # branch (core._pass_stages_impl)
            rgb8 = fastcodec.pixels_to_rgb8(enc_list[0][0], pastiche)
            for i, d in enumerate(depths):
                feat = fastcodec.encode_head(enc_list[i], d, rgb8,
                                             conv_dtype)
                feat = ot_local(i, feat)
                renorm = (enc_list[i + 1][0]
                          if i + 1 < len(depths) else None)
                rgb8 = fastcodec.decode_tail(dec_list[i], d, feat, renorm,
                                             conv_dtype)
            return fastcodec.rgb8_to_pixels(rgb8, jnp.float32)

        for i, d in enumerate(depths):
            if n_chunks > 1:
                pastiche = _chunked_stage_local(
                    enc_list[i], dec_list[i], pastiche, mus[i], covs[i],
                    eigvecs[i], jax.random.fold_in(key, i), k_masks[i],
                    depth=d, n_iters=iters[i], mode=mode,
                    pca_flag=pca_flags[i], n_chunks=n_chunks, axis=axis,
                    pad_mode=pad_mode, conv_dtype=conv_dtype)
                continue
            feat = encode(enc_list[i], d, pastiche, pad_mode)
            feat = ot_local(i, feat)
            pastiche = decode(dec_list[i], d, feat.astype(conv_dtype),
                              pad_mode)
        return pastiche.astype(jnp.float32)

    fn = jax.shard_map(
        pass_local, mesh=mesh,
        in_specs=(rep, rep, shard, rep, rep, rep, rep, rep, rep, rep),
        out_specs=shard,
        # pallas_call's out ShapeDtypeStructs carry no vma annotation, so
        # the varying-across-mesh check can't see through the fast-codec
        # kernels; everything they touch is shard-local by construction
        check_vma=not fast_codec)
    return jax.jit(fn, donate_argnums=(2,))

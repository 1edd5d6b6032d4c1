"""The pass/layer orchestration loop.

Reference behavior: ``OptimalTexture.forward`` (``/root/reference/optex.py:
81-139``) — multi-resolution passes over the VGG layer stack, each layer
running a budgeted number of sliced-OT iterations, with optional PCA
projection, content matching, two-style mixing, and a color-transfer tail.

TPU design inversion
--------------------
The reference drives every OT iteration from python (host rotation sampling,
~500 host<->device syncs per run). Here the schedule is STATIC (precomputed
host-side), so each (pass, layer) becomes ONE jitted stage::

    stage = decode(  unproject(  transport_loop_{n_iters}(  project(  encode(img)))))

with the iteration loop a ``lax.fori_loop`` over folded PRNG keys — zero host
round-trips inside a stage. Host work between stages is limited to: choosing
the PCA rank k (a data-dependent shape decision XLA cannot make), and python
orchestration. Stage programs are compiled once per (depth, shape, k,
n_iters) and cached by jit; the persistent compilation cache makes repeat
runs compile-free.

The per-stage pastiche buffer is donated (``donate_argnums``) so XLA reuses
the image buffer across stages instead of allocating fresh HBM.
"""

from __future__ import annotations

import os
import time
from collections import OrderedDict
from functools import partial
from typing import List, NamedTuple, Optional  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from . import config as config_mod
from . import transport
from .config import OptexConfig

from .models import fastcodec
from .models.vgg import VGGBank, decode, encode, encode_taps
from .ops import colors, histmatch
from .ops.resize import (apply_resample, resample_pair, resize_nearest_nhwc,
                         resize_nhwc)
from .utils import schedule


class LayerTargets(NamedTuple):
    """Per-(pass, layer) transport targets prepared by the pass prep."""
    stats: transport.StyleStats            # style moments (+ samples for cdf)
    eigvecs: Optional[jnp.ndarray]         # (C, k) PCA basis or None
    content: Optional[jnp.ndarray]         # projected, re-centered content feats
    k_mask: Optional[jnp.ndarray] = None   # traced true-k when pca_bucket > 0


# ---------------------------------------------------------------------------
# jitted building blocks (module-level so jit caches persist across passes)


@partial(jax.jit, static_argnames=("depth",))
def _encode_jit(params, depth: int, img):
    return encode(params, depth, img)


@partial(jax.jit, static_argnames=("size", "circular"))
def _resize_jit(img, *, size, circular: bool = False):
    """Constant-embedding resize program — kept ONLY for multi-device
    (sharded) inputs, where the weight-argument path would have to reason
    about placements; single-device callers use :func:`_resize_dev` (the
    embedded (out, in) weights are what overflowed the remote-compile
    transport at 8192px — ops/resize.apply_resample's docstring)."""
    return resize_nhwc(img, size, circular=circular)


_apply_resample_jit = jax.jit(apply_resample)
# LRU-bounded: entries are DEVICE-resident (out, in) float32 matrices (an
# 8192-row pair is ~100s of MB), and a long-lived server sees a new shape
# pair per uploaded style size — unbounded growth would leak HBM. 64
# entries covers every (pass, multires) shape of several concurrent
# configs; evicted weights just re-upload (host build is lru_cached too).
_RESAMPLE_DEV_CACHE = OrderedDict()
_RESAMPLE_DEV_CACHE_MAX = 64


def _resample_arrays(in_hw, out_hw, circular: bool, device=None):
    """Device-resident (wh, ww) weight pair, uploaded once per shape pair
    and reused by every program that resizes through it.

    The arrays are deliberately UNCOMMITTED (``jnp.asarray``, default
    device — on the one-chip TPU attachment that IS the chip, so the
    upload-once property holds). ``jax.device_put(w, device)`` would pin
    them, and a committed operand makes every downstream jit output
    committed too — style statistics prepped through a committed resize
    then CONFLICT with mesh-sharded pastiches inside the DP/SP
    jit(shard_map) stages ("incompatible devices"), where uncommitted
    inputs auto-replicate. Caught by
    tests/test_parallel.py::test_dp_batch_chunk_matches_single_device."""
    del device  # placement is deliberately left to JAX (see docstring)
    key = (tuple(in_hw), tuple(out_hw), circular)
    if key in _RESAMPLE_DEV_CACHE:
        _RESAMPLE_DEV_CACHE.move_to_end(key)
    else:
        wh, ww = resample_pair(tuple(in_hw), tuple(out_hw), circular)
        _RESAMPLE_DEV_CACHE[key] = (jnp.asarray(wh), jnp.asarray(ww))
        while len(_RESAMPLE_DEV_CACHE) > _RESAMPLE_DEV_CACHE_MAX:
            _RESAMPLE_DEV_CACHE.popitem(last=False)
    return _RESAMPLE_DEV_CACHE[key]


def _resize_dev(x, size, circular: bool = False):
    """Resize with weight-argument programs (no giant HLO constants)."""
    if tuple(x.shape[1:3]) == tuple(size):
        return x
    devs = x.devices() if hasattr(x, "devices") else set()
    if len(devs) != 1:
        # sharded input: keep the constant-embedding program
        return _resize_jit(x, size=tuple(size), circular=circular)
    wh, ww = _resample_arrays(x.shape[1:3], size, circular, next(iter(devs)))
    return _apply_resample_jit(x, wh, ww)


_GRAM_CHUNK_BYTES = 256 * 2 ** 20   # stream the Gram above this layer size


def _scalar_centered_gram(sf, s):
    """(N, C) scalar-mean-centered Gram ``(x-s)^T (x-s)`` without
    materializing the centered copy for huge layers: at 4096px the relu1_1
    style features are 4.3 GB f32, and the centered temp (plus the f32
    cast and the conv taps) pushed ONE pass's spectra program past HBM —
    the observed 4K prep OOM. Above the threshold the rows stream through
    a lax.scan accumulator in exact chunk-major order (a different f32
    summation order than the monolithic GEMM — tolerance-level, which is
    why small layers keep the single GEMM bit-for-bit)."""
    x2 = sf.reshape(-1, sf.shape[-1])
    rows, c = x2.shape
    hp = jax.lax.Precision.HIGHEST
    if rows * c * 4 > _GRAM_CHUNK_BYTES:
        target = max(1, (_GRAM_CHUNK_BYTES // 4) // c)
        n_chunks = -(-rows // target)
        while rows % n_chunks:       # need an exact split; rows from conv
            n_chunks += 1            # grids are highly composite
            if n_chunks > 4096:      # pathological size: fall back
                break
        if rows % n_chunks == 0:
            chunks = x2.reshape(n_chunks, rows // n_chunks, c)

            def body(g, ch):
                # widen PER CHUNK (bf16->f32 is exact) so the full-size f32
                # copy never exists
                xc = ch.astype(jnp.float32) - s
                return g + jnp.matmul(xc.T, xc, precision=hp), None

            g, _ = jax.lax.scan(body, jnp.zeros((c, c), jnp.float32), chunks)
            return g
    xc = x2.astype(jnp.float32) - s
    return jnp.matmul(xc.T, xc, precision=hp)


@partial(jax.jit, static_argnames=("depth", "use_pca"))
def _style_spectra_pass_jit(enc_params, style_tens, *, depth: int, use_pca: bool):
    """ONE fused program per pass: multi-tap style encode at every depth +
    (optionally) each depth's PCA spectrum (scalar-mean centering, Gram GEMM,
    eigh). Eigenvalues transfer to host (tiny); bases never leave the device.
    Fusing matters twice over: the multi-tap encode halves the conv work vs
    per-depth truncated encoders, and the 1-core host pays ~ms per dispatch,
    so a pass's style prep is one program instead of dozens of eager ops.

    Returns [(sf, s_vals, v)] ordered deepest-first (layer-loop order).
    ``sf`` crosses the program boundary in CONV dtype: bf16 -> f32 widening
    is exact, so downstream consumers widening on entry compute the
    identical f32 values while the cross-program residency halves — at
    4096px the f32 taps alone are 7.5 GB (part of the 4K prep OOM)."""
    conv_dtype = enc_params[0][0].dtype
    per_style = [encode_taps(enc_params, depth, s.astype(conv_dtype))
                 for s in style_tens]
    out = []
    for d in range(depth, 0, -1):
        sf = jnp.concatenate([t[d - 1] for t in per_style], axis=0)
        if use_pca:
            s = jnp.mean(sf, dtype=jnp.float32)   # convert fuses into the reduce
            g = _scalar_centered_gram(sf, s)
            eva, eve = jnp.linalg.eigh(g)
            s_vals = jnp.sqrt(jnp.maximum(eva[::-1], 0.0))
            out.append((sf, s_vals, eve[:, ::-1]))
        else:
            out.append((sf, None, None))
    return out


@partial(jax.jit, static_argnames=("ks", "need_samples"))
def _style_stats_pass_jit(sfs, vs, true_ks, *, ks, need_samples: bool):
    """Project every depth onto its first k PCs (ks chosen on host) and
    compute transport statistics — one fused program per pass.

    With pca_bucket, ``ks`` are the bucketed (static) widths and ``true_ks``
    the traced true ranks: eigvecs columns >= true_k are zeroed, so padded
    feature dims are exactly zero and the scalar style mean divides by the
    TRUE rank (matching the exact-k computation, optex.py:76).

    Returns [(sf_projected, eigvecs, stats, premix scalar mean)]."""
    out = []
    for sf, v, k, tk in zip(sfs, vs, ks, true_ks):
        # spectra hand sf over in conv dtype (r4); bf16 -> f32 is exact, so
        # widening here computes the same f32 values as the old f32 handoff
        sf = sf.astype(jnp.float32)
        eigvecs = None
        if k:
            eigvecs = v[:, :k]
            if tk is not None:
                col = jax.lax.broadcasted_iota(jnp.int32, eigvecs.shape, 1)
                eigvecs = jnp.where(col < tk, eigvecs, 0.0)
            # polish the basis: jax's f32 eigh eigenvectors are visibly
            # non-orthonormal (~1e-2), which distorts the project/unproject
            # round-trip; three Newton-Schulz polar steps restore
            # orthonormality within the same column space (zero-padded
            # columns stay exactly zero)
            for _ in range(3):
                vtv = jnp.matmul(eigvecs.T, eigvecs,
                                 precision=jax.lax.Precision.HIGHEST)
                eigvecs = 1.5 * eigvecs - 0.5 * jnp.matmul(
                    eigvecs, vtv, precision=jax.lax.Precision.HIGHEST)
            sf = jnp.matmul(sf, eigvecs, precision=jax.lax.Precision.HIGHEST)
        mu, cov = histmatch.moment_stats(sf)
        samples = sf.reshape(-1, sf.shape[-1]) if need_samples else None
        if k and tk is not None:
            n_samples = sf.size // sf.shape[-1]
            mean = jnp.sum(sf) / (n_samples * tk)  # zero pads don't count
        else:
            mean = sf.mean()
        out.append((sf, eigvecs, transport.StyleStats(mu, cov, samples), mean))
    return out


@partial(jax.jit, static_argnames=("depth", "use_pca"))
def _content_prep_pass_jit(enc_params, cont, eigvecs_list, style_means,
                           true_ks, *, depth: int, use_pca: bool):
    """Multi-tap content encode + per-depth projection into style PC space +
    re-centering at the style's scalar mean (optex.py:71-77), one program.
    With pca_bucket, the content's scalar mean divides by the TRUE rank
    (padded dims are exactly zero)."""
    taps = encode_taps(enc_params, depth, cont.astype(enc_params[0][0].dtype))
    out = []
    for i, d in enumerate(range(depth, 0, -1)):
        cf = taps[d - 1].astype(jnp.float32)
        if use_pca:
            cf = jnp.matmul(cf, eigvecs_list[i],
                            precision=jax.lax.Precision.HIGHEST)
        if use_pca and true_ks[i] is not None:
            n_samples = cf.size // cf.shape[-1]
            cmean = jnp.sum(cf) / (n_samples * true_ks[i])
        else:
            cmean = cf.mean()
        out.append(cf - cmean + style_means[i])
    return out


@jax.jit
def _traced_ks_jit(svals):
    """The reference's k rule (transport.choose_k: first index where the
    cumulative singular-value share exceeds 0.9, exclusive, clamped >= 1)
    computed ON DEVICE as traced scalars — the pca_traced_k mode's
    replacement for the host k-decision. With it, a run performs ZERO
    device->host syncs before the final fetch. The cumsum runs in f32
    (choose_k uses f64 on host), so a spectrum whose cumulative share sits
    within f32 rounding of the 0.9 threshold can flip k by one — the
    boundary component carries a negligible share either way."""
    out = []
    for s in svals:
        frac = jnp.cumsum(s) / jnp.sum(s)
        k = jnp.argmax(frac > 0.9).astype(jnp.int32)
        out.append(jnp.maximum(k, 1))
    return tuple(out)


@jax.jit
def _concat_svals_jit(svals):
    """Concatenate every pending pass/depth's singular values into ONE flat
    array so the k-decision drain is a single device->host transfer. Through
    the axon tunnel each fetch pays ~35 ms RTT regardless of size; the 15
    per-depth fetches of a cold 512px run were 0.56 s of a 0.68 s wall
    (jax.profiler trace, docs/PERF.md round-3)."""
    return jnp.concatenate(svals)


def _pass_stages_impl(enc_params, dec_params, pastiche, targets, key, *,
                      depths, iters, mode: str, strengths, pca_flags,
                      use_pallas=None, pad_mode: str = "reflect",
                      resize_to=None, cov_prop: bool = True,
                      resize_mats=None, fast_codec: bool = False):
    """ALL of a pass's layer stages in ONE program: the pass's multires
    resize (``resize_to``, in float32 — parity with the standalone step),
    the f32<->conv_dtype casts, and for each depth (deepest first)
    encode -> project -> OT loop -> unproject -> decode, the decoded image
    feeding the next stage directly on-device. One dispatch per pass instead
    of one per (pass, layer) plus resize/cast dispatches — on this host,
    dispatch gaps between device ops were a measurable slice of wall time
    (the warm serving path is dispatch-bound, not device-bound; see
    docs/PERF.md).

    ``pad_mode="wrap"`` = tileable synthesis (circular conv padding on the
    pastiche path only; style/content statistics are global, so the OT loop
    itself is shift-invariant already). Takes and returns float32.

    ``resize_mats``: the (wh, ww) resampling weights as RUNTIME arrays —
    required whenever ``resize_to`` is set, so the program never embeds
    the (out, in) matrices as constants (ops/resize.apply_resample)."""
    if resize_to is not None:
        pastiche = apply_resample(pastiche, *resize_mats)
    conv_dtype = enc_params[0][0][0].dtype
    pastiche = pastiche.astype(conv_dtype)

    def ot_stage(i, feat):
        feat = feat.astype(jnp.float32)
        if pca_flags[i]:
            feat = jnp.matmul(feat, targets[i].eigvecs,
                              precision=jax.lax.Precision.HIGHEST)
        feat = transport.transport_loop(
            jax.random.fold_in(key, i), feat, targets[i].stats, iters[i],
            mode, content_feature=targets[i].content,
            content_strength=strengths[i], k_mask=targets[i].k_mask,
            use_pallas=use_pallas, cov_prop=cov_prop)
        if pca_flags[i]:
            feat = jnp.matmul(feat, targets[i].eigvecs.T,
                              precision=jax.lax.Precision.HIGHEST)
        return feat

    if fast_codec:
        # relu1-scale codec section on the 2px-packed Pallas kernels; the
        # image lives as a post-renorm padded-RGB TCB tensor between stages
        # (models/fastcodec.py — full-res 64-ch maps never round-trip HBM)
        rgb8 = fastcodec.pixels_to_rgb8(enc_params[0][0], pastiche)
        for i, d in enumerate(depths):
            feat = fastcodec.encode_head(enc_params[i], d, rgb8, conv_dtype)
            feat = ot_stage(i, feat)
            renorm = enc_params[i + 1][0] if i + 1 < len(depths) else None
            rgb8 = fastcodec.decode_tail(dec_params[i], d, feat, renorm,
                                         conv_dtype)
        return fastcodec.rgb8_to_pixels(rgb8, jnp.float32)

    for i, d in enumerate(depths):
        feat = encode(enc_params[i], d, pastiche, pad_mode)
        feat = ot_stage(i, feat)
        pastiche = decode(dec_params[i], d, feat.astype(pastiche.dtype),
                          pad_mode)
    return pastiche.astype(jnp.float32)


_PASS_STATICS = ("depths", "iters", "mode", "strengths", "pca_flags",
                 "use_pallas", "pad_mode", "resize_to", "cov_prop",
                 "fast_codec")
# resize passes change the buffer shape, so donation can't apply there (and
# jax warns); gate-skip passes donate the same-shape pastiche buffer
_pass_stages_jit = partial(jax.jit, static_argnames=_PASS_STATICS,
                           donate_argnums=(2,))(_pass_stages_impl)
_pass_stages_jit_resize = partial(jax.jit,
                                  static_argnames=_PASS_STATICS)(_pass_stages_impl)


def _run_stages_impl(enc_params, dec_params, pastiche, targets_all, run_key,
                     *, depths, plans, mode: str, strengths_all,
                     pca_flags_all, use_pallas=None,
                     pad_mode: str = "reflect", cov_prop: bool = True,
                     resize_mats_all=None, content_px=None,
                     color_mode=None, quantize: bool = False,
                     fast_codec: bool = False):
    """The WHOLE run's pass chain in ONE program: every pass's multires
    resize + all its layer stages, chained on-device. One dispatch + one
    final sync per run where the per-pass path pays 5 dispatches + the
    resize/cast traffic — on this 1-core host the run is dispatch-bound, not
    device-bound (docs/PERF.md r3 trace), so the fusion is the warm-path
    floor. ``plans``: per-pass (resize_to | None, iters tuple);
    ``resize_mats_all``: the matching per-pass (wh, ww) weight arrays (see
    _pass_stages_impl — runtime args, never HLO constants).

    ``color_mode`` ("lum" | "opt", with ``content_px`` the raw content
    pixels) folds the color-transfer tail (optex.py:124-138) INTO the run
    program — the tail previously ran as 1-2 extra dispatches after the
    fused run (VERDICT r4 #3); same ops, same PRNG stream
    (fold_in(run_key, 0xC0102)) as the standalone _lum_target_jit /
    _pixel_ot_jit pair the per-pass timing path still uses."""
    for p, (resize_to, iters) in enumerate(plans):
        pastiche = _pass_stages_impl(
            enc_params, dec_params, pastiche, targets_all[p],
            jax.random.fold_in(run_key, p),
            depths=depths, iters=iters, mode=mode,
            strengths=strengths_all[p], pca_flags=pca_flags_all[p],
            use_pallas=use_pallas, pad_mode=pad_mode,
            resize_to=resize_to, cov_prop=cov_prop,
            resize_mats=resize_mats_all[p], fast_codec=fast_codec)
    if color_mode is not None:
        target = colors.swap_lightness(content_px, pastiche)
        if color_mode == "opt":
            key = jax.random.fold_in(run_key, 0xC0102)
            samples = target.reshape(-1, target.shape[-1])

            def body(i, img):
                return transport.ot_step_cdf(jax.random.fold_in(key, i), img,
                                             samples, use_pallas)

            pastiche = jax.lax.fori_loop(0, 3, body, pastiche)
        else:  # "lum"
            pastiche = target
    if quantize:
        # serving fast path: PNG-ready uint8 leaves the program directly
        # (same IEEE f32 ops as imageio.save_images' host formula, so the
        # response bytes are unchanged — serve._fetch_uint8, r4), saving
        # the separate quantize dispatch AND 4x the fetch bytes
        return (jnp.clip(pastiche, 0.0, 1.0) * 255.0 + 0.5
                ).astype(jnp.uint8)
    return pastiche


_RUN_STATICS = ("depths", "plans", "mode", "strengths_all", "pca_flags_all",
                "use_pallas", "pad_mode", "cov_prop", "color_mode",
                "quantize", "fast_codec")
# donation applies only when the run's entry shape equals its final shape
# (the usual case: noise at the target size, internal multires down/up);
# runs that end at a different size use the non-donating twin
_run_stages_jit = partial(jax.jit, static_argnames=_RUN_STATICS,
                          donate_argnums=(2,))(_run_stages_impl)
_run_stages_jit_nodonate = partial(jax.jit,
                                   static_argnames=_RUN_STATICS)(_run_stages_impl)


def _pass_stages_chunked_impl(enc_params, dec_params, pastiche, targets, key,
                              *, depths, iters, mode: str, pca_flags,
                              n_chunks: int, pad_mode: str = "reflect",
                              resize_to=None, resize_mats=None,
                              fast_codec: bool = False):
    """One pass with the batch micro-batched through the conv stacks.

    The batch-256 512px program OOMs on one chip because the codec's
    activation buffers scale with the FULL batch (relu1_1 alone is
    256x512x512x64 bf16 = 8.6 GB — the r4 saturation study's capacity wall,
    docs/PERF.md). The composed-transport path makes chunking natural: the
    only cross-image coupling in a stage is the joint (mu, cov) of the
    PROJECTED features (k-wide f32 — the smallest tensor in the stage), so

        1. encode + PCA-project chunk-by-chunk under ``lax.map`` (one
           chunk's conv intermediates live at a time), keeping only the
           k-wide projected features for the whole batch;
        2. build the stage's composed affine map from the joint moments
           (transport.stage_affine_map — C x C work, batch-independent);
        3. apply + unproject + decode chunk-by-chunk under a second map.

    Identical math to :func:`_pass_stages_impl` (same rotation stream, same
    f32 feature values, same reductions — equality-tested); moment modes
    with cov_propagation only (cdf/sort iterate over the full sample cloud
    by construction), synthesis only (content runs are single-image).

    ``fast_codec``: each chunk rides the Pallas relu1-scale kernels —
    gated by the caller on chunk size == the kernels' 128-lane width
    (fastcodec.eligible on ``cfg.batch_chunk``). Chunks live as post-renorm
    padded-RGB TCB between stages, exactly the fused fast branch
    (:func:`_pass_stages_impl`) mapped over chunks, so batch_chunk runs
    the codec at the measured batch-128 Pallas rate while peak HBM still
    scales with one chunk.
    """
    if resize_to is not None:
        pastiche = apply_resample(pastiche, *resize_mats)
    conv_dtype = enc_params[0][0][0].dtype
    pastiche = pastiche.astype(conv_dtype)
    b_total = pastiche.shape[0]

    if fast_codec:
        chunks = pastiche.reshape(n_chunks, b_total // n_chunks,
                                  *pastiche.shape[1:])
        rgb8 = jax.lax.map(
            lambda img: fastcodec.pixels_to_rgb8(enc_params[0][0], img),
            chunks)
        for i, d in enumerate(depths):
            tgt = targets[i]

            def enc_fast(r, _i=i, _d=d):
                feat = fastcodec.encode_head(
                    enc_params[_i], _d, r, conv_dtype).astype(jnp.float32)
                if pca_flags[_i]:
                    feat = jnp.matmul(feat, targets[_i].eigvecs,
                                      precision=jax.lax.Precision.HIGHEST)
                return feat

            feats = jax.lax.map(enc_fast, rgb8)
            nc, bc, h, w, c = feats.shape
            mu0, cov0 = histmatch.moment_stats(
                feats.reshape(b_total, h, w, c))
            A, bias = transport.stage_affine_map(
                jax.random.fold_in(key, i), mu0, cov0, tgt.stats, iters[i],
                mode, k_mask=tgt.k_mask)
            bias_chunks = bias.reshape(nc, bc, 1, 1, c)
            renorm = enc_params[i + 1][0] if i + 1 < len(depths) else None

            def dec_fast(args, _i=i, _d=d, _renorm=renorm, _A=A):
                f, bias_c = args
                out = jnp.matmul(f.reshape(-1, f.shape[-1]), _A,
                                 precision=jax.lax.Precision.HIGHEST
                                 ).reshape(f.shape) + bias_c
                if pca_flags[_i]:
                    out = jnp.matmul(out, targets[_i].eigvecs.T,
                                     precision=jax.lax.Precision.HIGHEST)
                return fastcodec.decode_tail(
                    dec_params[_i], _d, out.astype(conv_dtype), _renorm,
                    conv_dtype)

            rgb8 = jax.lax.map(dec_fast, (feats, bias_chunks))
        px = jax.lax.map(lambda r: fastcodec.rgb8_to_pixels(r, jnp.float32),
                         rgb8)
        return px.reshape(b_total, *px.shape[2:])

    for i, d in enumerate(depths):
        tgt = targets[i]

        def enc_chunk(img, _i=i, _d=d):
            feat = encode(enc_params[_i], _d, img,
                          pad_mode).astype(jnp.float32)
            if pca_flags[_i]:
                feat = jnp.matmul(feat, targets[_i].eigvecs,
                                  precision=jax.lax.Precision.HIGHEST)
            return feat

        chunks = pastiche.reshape(n_chunks, b_total // n_chunks,
                                  *pastiche.shape[1:])
        feats = jax.lax.map(enc_chunk, chunks)
        nc, bc, h, w, c = feats.shape
        mu0, cov0 = histmatch.moment_stats(feats.reshape(b_total, h, w, c))
        A, bias = transport.stage_affine_map(
            jax.random.fold_in(key, i), mu0, cov0, tgt.stats, iters[i],
            mode, k_mask=tgt.k_mask)
        bias_chunks = bias.reshape(nc, bc, 1, 1, c)

        def dec_chunk(args, _i=i, _d=d):
            f, bias_c = args
            out = jnp.matmul(f.reshape(-1, f.shape[-1]), A,
                             precision=jax.lax.Precision.HIGHEST
                             ).reshape(f.shape) + bias_c
            if pca_flags[_i]:
                out = jnp.matmul(out, targets[_i].eigvecs.T,
                                 precision=jax.lax.Precision.HIGHEST)
            return decode(dec_params[_i], _d, out.astype(conv_dtype),
                          pad_mode)

        out_chunks = jax.lax.map(dec_chunk, (feats, bias_chunks))
        pastiche = out_chunks.reshape(b_total, *out_chunks.shape[2:])
    return pastiche.astype(jnp.float32)


def _run_stages_chunked_impl(enc_params, dec_params, pastiche, targets_all,
                             run_key, *, depths, plans, mode: str,
                             pca_flags_all, n_chunks: int,
                             pad_mode: str = "reflect",
                             resize_mats_all=None, fast_codec: bool = False):
    """The whole run's pass chain, batch-chunked (see
    :func:`_pass_stages_chunked_impl`) — still ONE dispatched program."""
    for p, (resize_to, iters) in enumerate(plans):
        pastiche = _pass_stages_chunked_impl(
            enc_params, dec_params, pastiche, targets_all[p],
            jax.random.fold_in(run_key, p),
            depths=depths, iters=iters, mode=mode,
            pca_flags=pca_flags_all[p], n_chunks=n_chunks,
            pad_mode=pad_mode, resize_to=resize_to,
            resize_mats=resize_mats_all[p], fast_codec=fast_codec)
    return pastiche


_RUN_CHUNKED_STATICS = ("depths", "plans", "mode", "pca_flags_all",
                        "n_chunks", "pad_mode", "fast_codec")
_run_stages_chunked_jit = partial(
    jax.jit, static_argnames=_RUN_CHUNKED_STATICS,
    donate_argnums=(2,))(_run_stages_chunked_impl)
_run_stages_chunked_jit_nodonate = partial(
    jax.jit, static_argnames=_RUN_CHUNKED_STATICS)(_run_stages_chunked_impl)


def _mix_pair_impl(a, b, mask, *, mode: str, alpha: float):
    """Blend two same-shape style feature maps with a binary spatial mask and
    cross-histogram matching (optex.py:193-206)."""
    atob = histmatch.hist_match(a, b, mode)
    btoa = histmatch.hist_match(b, a, mode)
    return (a * (1 - alpha) + atob * alpha) * mask + \
           (btoa * (1 - alpha) + b * alpha) * (1 - mask)


_mix_pair_jit = partial(jax.jit,
                        static_argnames=("mode", "alpha"))(_mix_pair_impl)


def _mix_multi_impl(sfs, mask_onehot, weights, *, mode: str):
    """N-style mixing (extension beyond the reference's 2-style cap).

    Region i of the categorical mask shows
    ``sum_j w_j * hist_match(S_i -> S_j)`` — each style's feature map pulled
    toward every style's histogram in proportion to its weight. For N=2 with
    weights (1-alpha, alpha) this reduces EXACTLY to the reference blend
    (optex.py:193-206): region A shows A*(1-a) + AtoB*a, region B shows
    BtoA*(1-a) + B*a (regression-tested against :func:`_mix_pair_jit`).

    ``sfs``: tuple of N (1, H, W, C) maps; ``mask_onehot``: (1, H, W, N);
    ``weights``: (N,) array — TRACED, so serving different weight vectors
    reuses one compiled program (the weights only scale a fixed linear
    combination).
    """
    out = jnp.zeros_like(sfs[0])
    for i, si in enumerate(sfs):
        fi = jnp.zeros_like(si)
        for j in range(len(sfs)):
            fi = fi + weights[j] * (si if j == i else
                                    histmatch.hist_match(si, sfs[j], mode))
        out = out + fi * mask_onehot[..., i:i + 1]
    return out


_mix_multi_jit = partial(jax.jit, static_argnames=("mode",))(_mix_multi_impl)


def _mixed_stats(mixed, need_samples: bool):
    mu, cov = histmatch.moment_stats(mixed)
    samples = mixed.reshape(-1, mixed.shape[-1]) if need_samples else None
    return transport.StyleStats(mu, cov, samples)


@partial(jax.jit, static_argnames=("hw", "mode", "alpha", "need_samples"))
def _mix_pass_pair_jit(sfs, mask_key, *, hw, mode: str, alpha: float,
                       need_samples: bool):
    """ALL depths' 2-style mix + restat — and the mask draw itself — in ONE
    program per pass. The previous per-depth chain (mask resize ->
    _mix_pair_jit -> _restat_jit) was ~9 dispatches per pass, and the
    config-3 steady wall is PREP-dominated (~60% — docs/PERF.md r4): on this
    host every dispatch pays a tunnel round trip, so mixing prep is fused
    exactly like the spectra/stats programs. Same math, same PRNG bits
    (threefry is identical eager vs traced)."""
    u = jax.random.uniform(mask_key, hw)
    mask = jnp.ceil(u - alpha)[None, :, :, None]
    out = []
    for sf in sfs:
        m = resize_nearest_nhwc(mask, sf.shape[1:3])
        mixed = _mix_pair_impl(sf[0:1], sf[1:2], m, mode=mode, alpha=alpha)
        out.append(_mixed_stats(mixed, need_samples))
    return tuple(out)


@partial(jax.jit, static_argnames=("hw", "n_styles", "mode", "need_samples"))
def _mix_pass_multi_jit(sfs, mask_key, weights, *, hw, n_styles: int,
                        mode: str, need_samples: bool):
    """N-style variant of :func:`_mix_pass_pair_jit` (one fused program per
    pass; weights stay traced so serving different weight vectors reuses one
    compiled program)."""
    regions = jax.random.categorical(mask_key, jnp.log(weights), shape=hw)
    mask = jax.nn.one_hot(regions, n_styles, dtype=jnp.float32)[None]
    out = []
    for sf in sfs:
        m = resize_nearest_nhwc(mask, sf.shape[1:3])
        mixed = _mix_multi_impl(
            tuple(sf[i:i + 1] for i in range(n_styles)), m, weights,
            mode=mode)
        out.append(_mixed_stats(mixed, need_samples))
    return tuple(out)


@partial(jax.jit, static_argnames=("n_iters", "use_pallas"))
def _pixel_ot_jit(pastiche, target, key, *, n_iters: int, use_pallas=None):
    """Pixel-space sliced OT with cdf matching — the 'opt' color transfer
    (optex.py:130-134): 3 iterations over 3x3 rotations."""
    samples = target.reshape(-1, target.shape[-1])

    def body(i, img):
        return transport.ot_step_cdf(jax.random.fold_in(key, i), img, samples,
                                     use_pallas)

    return jax.lax.fori_loop(0, n_iters, body, pastiche)


_lum_target_jit = jax.jit(colors.swap_lightness)

# PNG-ready quantize, the exact IEEE ops of imageio.save_images' host
# formula (serve's response path; also the non-fused tail of
# run(quantize_uint8=True))
_quant_u8_jit = jax.jit(
    lambda x: (jnp.clip(x, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8))


def _styles_fingerprint(styles) -> str:
    """Cheap content fingerprint of the style arrays, folded into the
    ``styles_token`` cache key so a stale token can never return another
    style's cached statistics (VERDICT r2 weak #6): a token only hits when
    the styles' CONTENT also matches.

    Hashes shape + dtype + a strided <=16x16 pixel sample per style. For
    host numpy arrays this is free; for device arrays it fetches ~3 KB once
    per run (negligible against a run's wall). Two distinct style images
    colliding on 768+ sampled float pixels is not a realistic failure mode —
    this is a cache-poisoning guard, not a cryptographic identity.
    """
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    for s in styles:
        shape = tuple(s.shape)
        h.update(repr((shape, str(s.dtype))).encode())
        sh = max(1, shape[1] // 16)
        sw = max(1, shape[2] // 16)
        sample = np.asarray(s[:, ::sh, ::sw, :])
        h.update(np.ascontiguousarray(sample).tobytes())
    return h.hexdigest()


# ---------------------------------------------------------------------------


class Synthesizer:
    """Holds the VGG bank + static schedule and runs the full algorithm."""

    def __init__(self, cfg: OptexConfig, bank: Optional[VGGBank] = None):
        self.cfg = cfg.validate()
        self.bank = bank or VGGBank(cfg.depth, dtype=jnp.dtype(cfg.conv_dtype))
        self.depth = self.bank.max_depth
        self.iters_table, self.sizes = schedule.iters_and_sizes(
            cfg.size, cfg.iters, cfg.passes, not cfg.no_multires,
            quirk=cfg.compat_schedule_quirk, num_layers=self.depth)
        if cfg.tileable:
            # odd sizes reach ceil-mode pooling's -inf pad row, which breaks
            # the torus equivariance that makes the output tile (multires
            # sizes are 32-rounded and always safe; exact sizes may not be)
            stride = 2 ** (self.depth - 1)
            for size in self.sizes:
                if size % stride:
                    raise ValueError(
                        f"tileable needs every pass size divisible by "
                        f"{stride} (2^(depth-1)); pass size {size} is not")
        # layer-loop position l uses depth D-l (deepest first, optex.py:42-43)
        self.layer_depths = [self.depth - l for l in range(self.depth)]
        self._run_counter = 0
        self.reseed(cfg.seed)
        # cross-run style prep cache (LRU), keyed (styles_token, pass size)
        self._style_prep_cache = OrderedDict()

        # multi-chip parallelism. Three layouts (validate() gates combos):
        # 1-D batch DP ("data"), 1-D spatial SP ("space"), or the 2-D
        # batch x height grid (r3) — all synthesis-only except SP (content
        # runs are single-image; the reference ignores --batch with content)
        self.mesh = None
        self.grid_mesh = None
        self._dp_stages = {}
        self._grid_stages = {}
        if cfg.spatial_devices > 1:
            from .parallel.spatial import check_spatial_divisibility

            for size in self.sizes:
                check_spatial_divisibility(size, cfg.spatial_devices,
                                           self.depth)
        if cfg.num_devices > 1 and cfg.spatial_devices > 1:
            from .parallel.grid import make_grid_mesh

            self.grid_mesh = make_grid_mesh(cfg.num_devices,
                                            cfg.spatial_devices)
        elif cfg.num_devices > 1:
            from .parallel.mesh import make_mesh

            if cfg.batch % cfg.num_devices != 0:
                raise ValueError(
                    f"batch {cfg.batch} not divisible by num_devices "
                    f"{cfg.num_devices}")
            self.mesh = make_mesh(cfg.num_devices)

        # spatial (H-axis) sharding of one image across chips (1-D; the
        # batch x height combination builds grid_mesh above instead)
        self.space_mesh = None
        self._sp_stages = {}
        if cfg.spatial_devices > 1 and self.grid_mesh is None:
            from .parallel.mesh import make_mesh

            self.space_mesh = make_mesh(cfg.spatial_devices, axis="space")

    def _dp_pass(self, iters, strengths, pca_flags, n_chunks: int = 1,
                 fast_codec: bool = False):
        """Fused whole-pass DP program (one dispatch per pass, VERDICT r2
        next-step #4), cached per (iters, strengths, pca_flags, n_chunks,
        fast_codec). ``n_chunks > 1`` = batch_chunk x DP: each chip micro-
        batches its local shard's codec (shard_ot._chunked_stage_local).
        ``fast_codec`` = the per-device Pallas relu1-scale codec (local
        batch == 128; gated by _dp_fast_codec)."""
        from .parallel.shard_ot import make_sharded_pass

        key = (iters, strengths, pca_flags, n_chunks, fast_codec)
        if key not in self._dp_stages:
            self._dp_stages[key] = make_sharded_pass(
                self.mesh, depths=tuple(self.layer_depths), iters=iters,
                mode=self.cfg.hist_mode, strengths=strengths,
                pca_flags=pca_flags,
                pad_mode="wrap" if self.cfg.tileable else "reflect",
                cov_prop=self.cfg.cov_propagation, n_chunks=n_chunks,
                fast_codec=fast_codec)
        return self._dp_stages[key]

    def _dp_fast_codec(self, global_batch: int, visit_sizes,
                       n_chunks: int = 1) -> bool:
        """DP mirror of run()'s single-device fast_codec gate, on the
        per-device LOCAL batch — or, when batch_chunk x DP is active, the
        per-device CHUNK (both must be the kernels' 128-lane width)."""
        cfg = self.cfg
        if not (cfg.fast_codec and cfg.use_pallas) or cfg.tileable:
            return False
        n_loc = global_batch // self.mesh.devices.size // n_chunks
        return fastcodec.eligible(
            n_loc, visit_sizes, "reflect",
            self.bank.enc_params[self.layer_depths[0]][0][0].dtype)

    def _dp_chunks(self, global_batch: int, has_content: bool) -> int:
        """batch_chunk x DP gate — the DP mirror of run()'s single-device
        ``use_chunked`` decision, on the per-device LOCAL batch."""
        cfg = self.cfg
        n_loc = global_batch // self.mesh.devices.size
        if (cfg.batch_chunk > 0 and n_loc > cfg.batch_chunk
                and n_loc % cfg.batch_chunk == 0
                and not has_content
                and cfg.hist_mode not in ("cdf", "sort")
                and cfg.cov_propagation
                and transport.cov_propagation_enabled()):
            return n_loc // cfg.batch_chunk
        return 1

    def _dp_shard(self, pastiche):
        from .parallel.mesh import batch_sharding

        return jax.device_put(pastiche, batch_sharding(self.mesh))

    def _sp_pass(self, iters, strengths, pca_flags):
        from .parallel.spatial import make_spatial_pass

        key = (iters, strengths, pca_flags)
        if key not in self._sp_stages:
            self._sp_stages[key] = make_spatial_pass(
                self.space_mesh, depths=tuple(self.layer_depths), iters=iters,
                mode=self.cfg.hist_mode, strengths=strengths,
                pca_flags=pca_flags,
                pad_mode="wrap" if self.cfg.tileable else "reflect",
                cov_prop=self.cfg.cov_propagation)
        return self._sp_stages[key]

    def _sp_shard(self, pastiche):
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(
            pastiche, NamedSharding(self.space_mesh, P(None, "space", None, None)))

    def _grid_pass(self, iters, strengths, pca_flags):
        from .parallel.grid import make_grid_pass

        key = (iters, strengths, pca_flags)
        if key not in self._grid_stages:
            self._grid_stages[key] = make_grid_pass(
                self.grid_mesh, depths=tuple(self.layer_depths), iters=iters,
                mode=self.cfg.hist_mode, strengths=strengths,
                pca_flags=pca_flags,
                pad_mode="wrap" if self.cfg.tileable else "reflect",
                cov_prop=self.cfg.cov_propagation)
        return self._grid_stages[key]

    def _grid_shard(self, pastiche):
        from .parallel.grid import grid_sharding

        return jax.device_put(pastiche, grid_sharding(self.grid_mesh))

    def reseed(self, seed: Optional[int]) -> None:
        """(Re-)key this instance for ``seed``. Warm pools that exclude seed
        from their cache signature call this per request: an explicit seed
        always resets to its deterministic key (identical requests reproduce
        regardless of pool history); ``None`` after a seeded phase draws
        fresh entropy; ``None`` on an already-unseeded instance is a no-op
        (the run counter keeps advancing — serving requests must differ)."""
        if seed is None:
            if getattr(self, "_seeded", True):
                entropy = np.random.SeedSequence().entropy % (2 ** 63)
                self.key = jax.random.key(int(entropy))
                self._run_counter = 0
            self._seeded = False
        else:
            self.key = jax.random.key(int(seed))
            self._seeded = True

    def next_run_key(self) -> jax.Array:
        """Per-run PRNG key. With an explicit seed every run reuses the base
        key (byte-identical reruns — the reproducibility contract); unseeded,
        a run counter is folded in so repeated ``run()`` calls on one warm
        instance (e.g. a serving pool) draw fresh rotations and callers can
        derive fresh noise. Fixes VERDICT r1 weak #2."""
        if self._seeded:
            return self.key
        k = jax.random.fold_in(self.key, self._run_counter)
        self._run_counter += 1
        return k

    # -- input preparation ----------------------------------------------------

    def _plan_passes(self, pastiche_hw, content_hw):
        """Static per-pass I/O plan replicating the reference's resize gate
        (optex.py:47: skip when EITHER pastiche dim already equals the pass
        size). The pastiche's shape chain is fully determined by the entry
        shape, so the whole plan is host-side static — which lets style/
        content preparation for ALL passes dispatch ahead of the stage chain.

        Returns [(size, resize?, cont_size)] where cont_size is the pastiche
        target size when resizing (None otherwise)."""
        plan = []
        cur = pastiche_hw
        for size in self.sizes:
            if self.cfg.out_width and content_hw is None:
                # non-square synthesis (extension): the width follows the
                # pass size with the same aspect rule content uses. The
                # reference's EITHER-dim gate would falsely skip passes
                # whose HEIGHT target matches the current WIDTH (e.g.
                # out_width 576 at size 512 skips the final pass), so this
                # extension gates on the full (H, W) pair instead.
                target = schedule.get_size(size, 1.0, self.cfg.size,
                                           self.cfg.out_width)
                if tuple(cur) != target:
                    plan.append((size, True, target))
                    cur = target
                else:
                    plan.append((size, False, None))
            elif cur[0] != size and cur[1] != size:
                if content_hw is not None:
                    cont_size = schedule.get_size(size, 1.0, content_hw[0],
                                                  content_hw[1], oversize=True)
                else:
                    cont_size = (size, size)
                plan.append((size, True, cont_size))
                cur = cont_size
            else:
                plan.append((size, False, None))
        return plan

    # All-pass prefetch budget: above it run() switches to the sequential
    # low-memory prep. Sized for 16 GB HBM (v5e). None = resolve
    # OPTEX_PREP_PREFETCH_GB at RUN time through config.prep_prefetch_bytes()
    # (the unified knob-latching rule — config.py owns the story); a class
    # attribute so tests can pin the gate.
    _PREP_PREFETCH_BYTES = None

    def _prep_budget_bytes(self) -> int:
        return (self._PREP_PREFETCH_BYTES
                if self._PREP_PREFETCH_BYTES is not None
                else config_mod.prep_prefetch_bytes())

    def _prep_prefetch_bytes(self, plan, styles) -> int:
        """Static estimate of the all-pass style-prep footprint: the f32
        multi-tap spectra of every DISTINCT pass prep coexist from phase A
        until the slim targets supersede them. At 4096px this alone is
        ~15 GB (relu1_1 of the style is HxWx64 f32 per pass) — the observed
        4K OOM fired in the k-decision drain, before any stage ran. Above
        the budget run() switches to the sequential low-memory prep."""
        channels = [64, 128, 256, 512, 512]
        seen = set()
        total = 0
        for (size, rs, _) in plan:
            ck = size if rs else None
            if ck in seen:
                continue
            seen.add(ck)
            for s in styles:
                if rs:
                    h, w = schedule.get_size(size, self.cfg.style_scale,
                                             s.shape[1], s.shape[2])
                else:
                    h, w = s.shape[1], s.shape[2]
                for d in range(1, self.depth + 1):
                    total += (h // 2 ** (d - 1)) * (w // 2 ** (d - 1)) \
                        * channels[d - 1] * 4
        return total

    def _dispatch_style_prep(self, styles, size: int, do_resize: bool):
        """Dispatch one pass's style resize + multi-tap encode + spectra —
        no host syncs. Gate-skip passes (do_resize False) encode the ORIGINAL
        styles, mirroring the reference (optex.py:47)."""
        cfg = self.cfg
        # device upload point — lazy (a fully-warm tokened run never gets
        # here, r5 census) but ONCE per run: run() passes its own run-local
        # list, so converting IN PLACE makes the second pass's prep reuse
        # the first's device buffers. A per-call asarray re-uploaded the
        # styles once per distinct pass size (5x ~4 MB through the tunnel
        # at 512px = the +0.3 s cold regression this line un-does).
        for i, s in enumerate(styles):
            if not isinstance(s, jax.Array):
                styles[i] = jnp.asarray(s)
        if do_resize:
            style_tens = tuple(
                _resize_dev(s, schedule.get_size(size, cfg.style_scale,
                                                 s.shape[1], s.shape[2]))
                for s in styles
            )
        else:
            style_tens = tuple(styles)
        return _style_spectra_pass_jit(
            self.bank.enc_params[self.depth], style_tens,
            depth=self.depth, use_pca=not cfg.no_pca)

    def _choose_widths(self, spectra, svals_np=None):
        """Host k-decision for one pass's spectra: static program widths +
        traced true-rank masks (pca_bucket). ``svals_np`` supplies the
        already-fetched eigenvalues (the batched drain in run()); None falls
        back to per-depth fetches (standalone callers)."""
        cfg = self.cfg
        use_pca = not cfg.no_pca
        bucket = cfg.pca_bucket
        if use_pca and cfg.pca_traced_k:
            # no host decision at all: full static width per depth, rank as
            # a traced device scalar (see _traced_ks_jit)
            widths = tuple(sf.shape[-1] for (sf, _, _) in spectra)
            masks = _traced_ks_jit(tuple(sv for (_, sv, _) in spectra))
            return widths, masks
        if svals_np is None:
            svals_np = [np.asarray(sv) if use_pca else None
                        for (_, sv, _) in spectra]
        true = [transport.choose_k(sv) if use_pca else 0
                for sv, (_, _, _) in zip(svals_np, spectra)]
        if bucket and use_pca:
            widths = tuple(min(-(-t // bucket) * bucket, sf.shape[-1])
                           for t, (sf, _, _) in zip(true, spectra))
            masks = tuple(jnp.asarray(t, jnp.int32) for t in true)
        else:
            widths = tuple(true)
            masks = tuple(None for _ in true)
        return widths, masks

    def _finish_style_prep(self, spectra, ks, k_masks, pass_key,
                           n_styles: int):
        """After the k-decisions: fused stats (+ mixing). ``ks`` are static
        program widths (bucketed when pca_bucket > 0); ``k_masks`` the traced
        true ranks (None entries when exact). Returns
        [(eigvecs, stats, scalar style mean)] per depth (deepest first)."""
        cfg = self.cfg
        need_samples = cfg.hist_mode in ("cdf", "sort")
        prepared = _style_stats_pass_jit(
            tuple(sf for (sf, _, _) in spectra),
            tuple(v for (_, _, v) in spectra),
            tuple(k_masks),
            ks=ks, need_samples=need_samples)

        # two-style mixing happens on the (projected) feature maps, once per
        # pass, before moments are taken (optex.py:97-101); content
        # re-centering uses the PRE-mix means (optex.py:76 vs 97)
        if n_styles > 1:
            mask_pos = 1 if len(prepared) > 1 else 0
            hw = tuple(int(x) for x in prepared[mask_pos][0].shape[1:3])
            mask_key = jax.random.fold_in(pass_key, 7919)
            sfs = tuple(sf for (sf, _, _, _) in prepared)
            if n_styles == 2 and cfg.mixing_weights is None:
                # the reference's exact 2-style path (optex.py:97-101)
                stats_t = _mix_pass_pair_jit(
                    sfs, mask_key, hw=hw, mode=cfg.hist_mode,
                    alpha=cfg.mixing_alpha, need_samples=need_samples)
            else:
                # N-style generalization (see _mix_multi_impl)
                w = np.asarray(cfg.mixing_weights if cfg.mixing_weights
                               else [1.0] * n_styles, dtype=np.float64)
                w_arr = jnp.asarray(w / w.sum(), jnp.float32)
                stats_t = _mix_pass_multi_jit(
                    sfs, mask_key, w_arr, hw=hw, n_styles=n_styles,
                    mode=cfg.hist_mode, need_samples=need_samples)
            prepared = [(None, eigvecs, st, mean)
                        for st, (_, eigvecs, _, mean)
                        in zip(stats_t, prepared)]

        return [(eigvecs, stats, mean) for (_, eigvecs, stats, mean) in prepared]

    def _assemble_targets(self, slim, cont, k_masks):
        """Finished style targets + (per-run) content prep -> LayerTargets."""
        cfg = self.cfg
        content_feats = [None] * len(slim)
        if cont is not None:
            content_feats = _content_prep_pass_jit(
                self.bank.enc_params[self.depth], cont,
                tuple(s[0] for s in slim), tuple(s[2] for s in slim),
                tuple(k_masks), depth=self.depth, use_pca=not cfg.no_pca)
        return [
            LayerTargets(stats=stats, eigvecs=eigvecs, content=cf, k_mask=km)
            for (eigvecs, stats, _), cf, km in zip(slim, content_feats,
                                                   k_masks)
        ]

    # -- main loop -------------------------------------------------------------

    def run(self, pastiche, styles, content=None, verbose: bool = False,
            key: Optional[jax.Array] = None, styles_token=None,
            quantize_uint8: bool = False):
        """Full synthesis/transfer. Inputs are NHWC float32 jnp/np arrays.

        ``quantize_uint8``: return PNG-ready uint8 instead of float32 —
        quantized ON DEVICE with the exact IEEE ops of the host save
        formula (clip -> *255 + 0.5 -> truncating cast). On the fused
        single-device path the quantize runs inside the run program (zero
        extra dispatches); other paths append one quantize dispatch.

        ``key`` overrides the run's PRNG key (callers that also draw the
        input noise pass the same per-request key for a self-consistent run);
        default is :meth:`next_run_key`.

        ``styles_token``: any hashable identifying the ``styles`` CONTENT
        (e.g. a hash of the encoded bytes). When given, the per-pass style
        spectra + PCA k-decisions are cached on this instance and reused by
        later runs with the same token — the serving-pool fast path. The
        token is verified: a content fingerprint of the actual ``styles``
        arrays is folded into the cache key (:func:`_styles_fingerprint`),
        so a stale token with different styles recomputes instead of
        serving the cached styles' statistics."""
        timing = os.environ.get("OPTEX_TIMING") == "1"

        cfg = self.cfg
        run_key = key if key is not None else self.next_run_key()
        use_pallas = None if cfg.use_pallas else False
        # copy the pastiche: the stage programs donate their input buffer, and
        # when the resize gate skips (entry size == pass size) the caller's
        # array would reach the donated argument directly — a second run with
        # the same array would then hit an invalidated buffer. The fused
        # single-device path copies lazily in phase D, only when the chosen
        # twin actually donates (r5: one fewer warm-path dispatch otherwise).
        fused_path_run = (self.mesh is None and self.space_mesh is None
                          and self.grid_mesh is None and not timing)
        if not fused_path_run:
            pastiche = jnp.array(pastiche, copy=True)
        if styles_token is not None:
            styles_token = (styles_token, _styles_fingerprint(styles))
        # styles stay HOST arrays until a prep program actually needs them
        # (_dispatch_style_prep asarrays at dispatch): a fully-warm tokened
        # run previously re-uploaded every style through the tunnel (~4 MB /
        # 40 ms at 512px) only to never read the device copy (r5 census)
        styles = list(styles)
        if any(s.shape != styles[0].shape for s in styles[1:]):
            # mixing concatenates style batches (reference assert, optex.py:261)
            raise ValueError("style images must have the same shape; got "
                             f"{[tuple(s.shape) for s in styles]}")
        content = jnp.asarray(content) if content is not None else None
        use_pca = not cfg.no_pca

        # phase A: style/content prep for ALL passes dispatches up front (it
        # depends only on the static size plan, never on the pastiche), so
        # the k-decision sync drains the pipeline ONCE per run, not per pass
        plan = self._plan_passes(
            pastiche.shape[1:3],
            content.shape[1:3] if content is not None else None)
        if self.space_mesh is not None or self.grid_mesh is not None:
            # the pastiche's actual H chain can diverge from cfg.size with a
            # content image (get_size caps at the loaded dims); every pass's H
            # must still split evenly across the mesh at all conv depths
            from .parallel.spatial import check_spatial_divisibility

            cur_h = pastiche.shape[1]
            for (_, rs, cs) in plan:
                if rs:
                    cur_h = cs[0]
                check_spatial_divisibility(cur_h, cfg.spatial_devices,
                                           self.depth)
        # gate-skip passes encode the ORIGINAL (unresized) styles, so their
        # prep is identical — dispatch each distinct prep once and share (the
        # reference re-encodes every pass; all 5 of a no_multires run's preps
        # coincide). With ``styles_token`` the (spectra + k-decision) entries
        # additionally persist across run() calls, so a warm serving pool
        # skips ALL style conv/eigh device work AND the per-run k-decision
        # pipeline drain for repeated styles (r1 VERDICT next-step #7).
        # low-memory prep: above the prefetch budget (e.g. 4096px — ~15 GB
        # of coexisting f32 spectra, the observed 4K OOM) prep dispatches
        # per pass inside phase C and each entry's spectra are freed after
        # their last use, trading the single batched k-drain for a few
        # per-pass fetches (irrelevant at these walls)
        low_mem = (self._prep_prefetch_bytes(plan, styles)
                   > self._prep_budget_bytes())
        entries = []        # one per pass: [spectra, widths, masks]
        pending = []        # entries whose k-decision hasn't run yet
        local = {}
        prep_args = []      # (size, rs) per pass, for low_mem late dispatch
        for (size, rs, cs) in plan:
            ck = size if rs else None
            full = (styles_token, ck)
            prep_args.append((size, rs))
            if styles_token is not None and full in self._style_prep_cache:
                self._style_prep_cache.move_to_end(full)
                entry = self._style_prep_cache[full]
            elif ck in local:
                entry = local[ck]
            else:
                # slots: [spectra, widths, masks, cache key, finished slim
                # targets (single-style only; supersedes spectra once built)]
                entry = [None if low_mem else
                         self._dispatch_style_prep(styles, size, rs), None,
                         None, full, None]
                local[ck] = entry
                if not low_mem:
                    pending.append(entry)
            entries.append(entry)
        last_use = {id(e): p for p, e in enumerate(entries)}

        # phase B: one host drain for every NEW prep's k decisions; with
        # pca_bucket the program width rounds UP to the bucket (capped at C)
        # and the true rank rides along as a traced scalar. ALL pending
        # eigenvalue vectors ride ONE concatenated device->host transfer —
        # per-array fetches pay the tunnel RTT each (see _concat_svals_jit)
        svals_by_entry = [None] * len(pending)
        if pending and use_pca and not cfg.pca_traced_k:
            svals = [sv for e in pending for (_, sv, _) in e[0]]
            flat = np.asarray(_concat_svals_jit(tuple(svals)))
            offs = np.cumsum([0] + [s.shape[0] for s in svals])
            j = 0
            for idx, e in enumerate(pending):
                n = len(e[0])
                svals_by_entry[idx] = [flat[offs[j + i]:offs[j + i + 1]]
                                       for i in range(n)]
                j += n
        for entry, sv in zip(pending, svals_by_entry):
            entry[1], entry[2] = self._choose_widths(entry[0], sv)
            if styles_token is not None:
                self._style_prep_cache[entry[3]] = entry
        while len(self._style_prep_cache) > 6 * max(cfg.passes, 1):
            self._style_prep_cache.popitem(last=False)

        # per-pass content resize (from the ORIGINAL, like the reference —
        # optex.py:50-51 resizes forward()'s unmodified content every pass)
        conts = []
        rs_cache = {}
        for (size, rs, cs) in plan:
            if content is None:
                conts.append(None)
            elif rs:
                if cs not in rs_cache:
                    rs_cache[cs] = _resize_dev(content, cs)
                conts.append(rs_cache[cs])
            else:
                conts.append(content)

        # phase C: finish every pass's targets (device work already in
        # flight from phase A; this is host assembly + a few dispatches)
        per_pass = []   # (adj_targets, strengths, iters, do_resize, cont_size, pass_key)
        for p in range(cfg.passes):
            if verbose:
                print(f"Pass {p}, size {self.sizes[p]}", flush=True)
                for d in self.layer_depths:
                    print(f"Layer: relu{d}_1", flush=True)
            # pass_key is only consumed by the prep-finish (mixing mask) and
            # the non-fused (timing / sharded) stage paths; the fused run
            # program folds its own per-pass keys from run_key. Computing it
            # eagerly here cost a fully-warm run 5 tunnel dispatches for
            # keys nobody read (r5 census) — compute lazily.
            e = entries[p]
            pass_key = (None if fused_path_run and e[4] is not None
                        else jax.random.fold_in(run_key, p))
            t0 = time.time()
            if e[1] is None and e[4] is None:
                # low_mem: this pass's prep dispatches HERE (nothing was
                # prefetched) and its k-decision drains individually
                if e[0] is None:
                    e[0] = self._dispatch_style_prep(styles, *prep_args[p])
                e[1], e[2] = self._choose_widths(e[0])
                if styles_token is not None and len(styles) == 1:
                    # multi-style (mixing) entries are NOT persisted under
                    # low_mem: their finished targets are pass_key-dependent
                    # (the mask draw), so the cache could only hold the raw
                    # full-size spectra — pinning the very GB-scale buffers
                    # the low-memory gate exists to shed. They free at last
                    # use below; a future tokened run re-preps.
                    self._style_prep_cache[e[3]] = e
            if e[4] is not None:
                slim = e[4]
            else:
                slim = self._finish_style_prep(e[0], e[1], e[2],
                                               pass_key, len(styles))
                if len(styles) == 1:
                    # single-style finished targets are pass_key-free: share
                    # across passes and (with a token) across runs
                    e[4] = slim
            targets = self._assemble_targets(slim, conts[p], e[2])
            _, do_resize, cont_size = plan[p]

            # content matching only at the 3 deepest of the 5 layers
            # (optex.py:115-117: l <= 2), with strength /16 /8 /4 of
            # content_strength. At depth < 5 the two anchors diverge (see
            # OptexConfig.content_anchor); at depth 5 they coincide.
            adj = []
            strengths = []
            for l, tgt in enumerate(targets):
                d = self.layer_depths[l]
                if cfg.content_anchor == "depth":
                    has_content = tgt.content is not None and d >= 3
                    strength = cfg.content_strength / 2 ** (d - 1)
                else:  # "index": the reference's literal l <= 2 rule
                    has_content = tgt.content is not None and l <= 2
                    strength = cfg.content_strength / 2 ** (4 - l)
                # feat += 0 * (cf - feat) is an exact no-op: drop the content
                # target so zero-strength stages take the covariance-
                # propagated loop
                has_content = has_content and strength != 0.0
                adj.append(tgt if has_content else
                           LayerTargets(tgt.stats, tgt.eigvecs, None,
                                        tgt.k_mask))
                strengths.append(float(strength) if has_content else 0.0)
            per_pass.append((tuple(adj), tuple(strengths),
                             tuple(int(i) for i in self.iters_table[p]),
                             do_resize, cont_size, pass_key))
            cached = (styles_token is not None
                      and self._style_prep_cache.get(e[3]) is e)
            if (low_mem and last_use[id(e)] == p
                    and (not cached or e[4] is not None)):
                # free this pass's raw spectra NOW — mid-run delete RPCs
                # cost ~5 ms each through the tunnel (the non-low_mem path
                # defers them to run end for that reason), but here memory
                # headroom is the whole point. Freed: untokened entries,
                # tokened single-style entries (their slim targets e[4]
                # supersede the spectra), and tokened MULTI-STYLE entries
                # (never inserted under low_mem — see phase C above). Kept:
                # cache-hit entries whose spectra future runs still need.
                e[0] = None
            if timing:
                jax.block_until_ready([t.stats.cov_raw for t in targets])
                print(f"  pass prep: {(time.time()-t0)*1000:.1f} ms", flush=True)

        # realized per-(pass, layer) program widths; consumed by the analytic
        # FLOP model in bench.py (utils/flops.py)
        self.last_run_ks = [e[1] for e in entries]
        while len(self._style_prep_cache) > 6 * max(cfg.passes, 1):
            # low_mem inserts entries during phase C, after the phase-B
            # eviction already ran
            self._style_prep_cache.popitem(last=False)

        # phase D: execute. Single-device non-timing runs fuse the WHOLE
        # chain (every pass's resize + stages) into ONE program — one
        # dispatch per run (docs/PERF.md r3: the host, not the device, is
        # the bottleneck). OPTEX_TIMING keeps the per-pass dispatch path so
        # per-pass walls stay observable. Sharded paths run one fused
        # program per pass (collectives inside).
        enc_all = tuple(self.bank.enc_params[d] for d in self.layer_depths)
        dec_all = tuple(self.bank.dec_params[d] for d in self.layer_depths)
        depths = tuple(self.layer_depths)
        pad_mode = "wrap" if cfg.tileable else "reflect"
        color_done = False  # True when the fused run program applied the tail
        if (self.mesh is None and self.space_mesh is None
                and self.grid_mesh is None and not timing):
            plans = tuple(((cs if rs else None), iters)
                          for (_, _, iters, rs, cs, _) in per_pass)
            final_hw = tuple(pastiche.shape[1:3])
            for (_, rs, cs) in plan:
                if rs:
                    final_hw = tuple(cs)
            donate = final_hw == tuple(pastiche.shape[1:3])
            pca_flags_all = tuple(
                tuple(t.eigvecs is not None for t in adj)
                for (adj, *_) in per_pass)
            # resampling weights ride as runtime arrays (one device upload
            # per (shapes, device), cached) — embedding them as program
            # constants broke the remote compile at 8192px (ops/resize)
            # the lazy-copy trim (r5) can leave a non-donating fused run's
            # pastiche as the caller's HOST array until dispatch — resize
            # mats then belong on the default device jit will place it on
            dev = (next(iter(pastiche.devices()))
                   if hasattr(pastiche, "devices") else jax.devices()[0])
            mats_all, cur_hw = [], tuple(pastiche.shape[1:3])
            for (resize_to, _) in plans:
                if resize_to is not None:
                    mats_all.append(_resample_arrays(
                        cur_hw, tuple(resize_to), cfg.tileable, dev))
                    cur_hw = tuple(resize_to)
                else:
                    mats_all.append(None)
            mats_all = tuple(mats_all)
            # batch_chunk: micro-batch the codec through lax.map so peak HBM
            # scales with the chunk, not the batch (breaks the batch-256
            # capacity wall — see _pass_stages_chunked_impl). Content runs
            # are single-image and cdf/sort iterate over the full sample
            # cloud, so those fall back to the monolithic program.
            use_chunked = (
                cfg.batch_chunk > 0 and pastiche.shape[0] > cfg.batch_chunk
                and pastiche.shape[0] % cfg.batch_chunk == 0
                and content is None
                and cfg.hist_mode not in ("cdf", "sort")
                and cfg.cov_propagation
                and transport.cov_propagation_enabled())
            # relu1-scale codec section on the Pallas kernels when the run
            # fits their static contract (models/fastcodec.eligible): the
            # batch-128 bf16 throughput point of record; every other shape
            # keeps the XLA codec bit-for-bit. Chunked runs are eligible
            # when the CHUNK is the kernels' 128-lane width (batch_chunk
            # becomes a throughput path, not just a capacity knob).
            visit_sizes = [tuple(pastiche.shape[1:3])]
            visit_sizes += [tuple(rt) for (rt, _) in plans if rt is not None]
            fc_batch = cfg.batch_chunk if use_chunked else pastiche.shape[0]
            fast_codec = (cfg.fast_codec and cfg.use_pallas
                          and fastcodec.eligible(fc_batch,
                                                 visit_sizes, pad_mode,
                                                 self.bank.enc_params[
                                                     depths[0]][0][0].dtype))
            # lazy copy (see run() entry): only a donating twin invalidates
            # the caller's buffer
            donating = donate and (use_chunked or not quantize_uint8)
            if donating:
                pastiche = jnp.array(pastiche, copy=True)
            if use_chunked:
                run_fn = (_run_stages_chunked_jit if donating
                          else _run_stages_chunked_jit_nodonate)
                pastiche = run_fn(
                    enc_all, dec_all, pastiche,
                    tuple(t for (t, *_) in per_pass), run_key,
                    depths=depths, plans=plans, mode=cfg.hist_mode,
                    pca_flags_all=pca_flags_all,
                    n_chunks=pastiche.shape[0] // cfg.batch_chunk,
                    pad_mode=pad_mode, resize_mats_all=mats_all,
                    fast_codec=fast_codec)
            else:
                # fold the color-transfer tail into the run program (one
                # dispatch total — VERDICT r4 #3); the per-pass timing /
                # sharded paths below keep the standalone tail dispatches
                fused_color = cfg.color_transfer
                if fused_color is not None and content is None:
                    raise ValueError("Color transfer requires content image")
                # a quantized (uint8) output can't alias the f32 input
                # buffer, so donation would only warn — use the twin
                run_fn = (_run_stages_jit if donating
                          else _run_stages_jit_nodonate)
                pastiche = run_fn(
                    enc_all, dec_all, pastiche,
                    tuple(t for (t, *_) in per_pass), run_key,
                    depths=depths, plans=plans, mode=cfg.hist_mode,
                    strengths_all=tuple(s for (_, s, *_) in per_pass),
                    pca_flags_all=pca_flags_all,
                    use_pallas=use_pallas, pad_mode=pad_mode,
                    cov_prop=cfg.cov_propagation,
                    resize_mats_all=mats_all,
                    content_px=content if fused_color is not None else None,
                    color_mode=fused_color, quantize=quantize_uint8,
                    fast_codec=fast_codec)
                color_done = fused_color is not None
        else:
            # DP fast-codec gate (static for the whole run, like the fused
            # branch's): every visited size must satisfy the kernel contract
            dp_visit_sizes = [tuple(pastiche.shape[1:3])] + [
                tuple(cs) for (_, _, _, dr, cs, _) in per_pass if dr]
            for (adj, strengths, iters, do_resize, cont_size,
                 pass_key) in per_pass:
                if (((self.mesh is not None or self.grid_mesh is not None)
                        and content is None)
                        or self.space_mesh is not None):
                    # DP path (synthesis only — the reference ignores
                    # --batch with content, optex.py:263): batch sharded,
                    # collectives once per pass (the joint covariance psum).
                    # SP path: one image's H axis sharded; halo-exchange
                    # convs + sequence-parallel OT (exact global moments /
                    # psum'd global cdf histograms), content features
                    # H-sharded like the pastiche's features.
                    if do_resize:
                        pastiche = _resize_dev(pastiche, cont_size,
                                               circular=cfg.tileable)
                    pca_flags = tuple(t.eigvecs is not None for t in adj)
                    if self.grid_mesh is not None:
                        stage = self._grid_pass(iters, strengths, pca_flags)
                        pastiche = self._grid_shard(pastiche)
                    elif self.mesh is not None:
                        n_chunks = self._dp_chunks(pastiche.shape[0],
                                                   content is not None)
                        stage = self._dp_pass(
                            iters, strengths, pca_flags, n_chunks,
                            fast_codec=(content is None
                                        and self._dp_fast_codec(
                                            pastiche.shape[0],
                                            dp_visit_sizes, n_chunks)))
                        pastiche = self._dp_shard(pastiche)
                    else:
                        stage = self._sp_pass(iters, strengths, pca_flags)
                        pastiche = self._sp_shard(pastiche)
                    pastiche = stage(
                        enc_all, dec_all, pastiche,
                        tuple(t.stats.mu for t in adj),
                        tuple(t.stats.cov_raw for t in adj),
                        tuple(t.stats.samples for t in adj),
                        tuple(t.eigvecs for t in adj),
                        tuple(t.content for t in adj),
                        pass_key, tuple(t.k_mask for t in adj))
                else:
                    t0 = time.time()
                    stage_fn = _pass_stages_jit_resize if do_resize else \
                        _pass_stages_jit
                    mats = _resample_arrays(
                        pastiche.shape[1:3], tuple(cont_size), cfg.tileable,
                        next(iter(pastiche.devices()))) if do_resize else None
                    pastiche = stage_fn(
                        enc_all, dec_all, pastiche, adj, pass_key,
                        depths=depths, iters=iters, mode=cfg.hist_mode,
                        strengths=strengths,
                        pca_flags=tuple(t.eigvecs is not None for t in adj),
                        use_pallas=use_pallas, pad_mode=pad_mode,
                        resize_to=cont_size if do_resize else None,
                        cov_prop=cfg.cov_propagation, resize_mats=mats)
                    if timing:
                        pastiche.block_until_ready()
                        print(f"  pass stages: "
                              f"{(time.time()-t0)*1000:.1f} ms", flush=True)

        if cfg.color_transfer is not None and not color_done:
            if content is None:
                raise ValueError("Color transfer requires content image")
            target = _lum_target_jit(content, pastiche)
            if cfg.color_transfer == "opt":
                pastiche = _pixel_ot_jit(pastiche, target,
                                         jax.random.fold_in(run_key, 0xC0102),
                                         n_iters=3, use_pallas=use_pallas)
            else:  # "lum"
                pastiche = target

        # persistent cache entries: the finished slim targets supersede the
        # raw spectra — free them, but only NOW: dropping device buffers
        # mid-run issues delete RPCs that serialize against stage dispatches
        # through the axon tunnel (~5 ms each, measured +0.1 s per cold run)
        if styles_token is not None:
            for e in {id(e2): e2 for e2 in entries}.values():
                if e[4] is not None:
                    e[0] = None

        if quantize_uint8 and pastiche.dtype != jnp.uint8:
            # non-fused paths (timing / sharded / chunked / separate color
            # tail): one standalone quantize dispatch
            pastiche = _quant_u8_jit(pastiche)
        return pastiche


def synthesize(cfg: OptexConfig, styles, content=None, pastiche=None,
               verbose: bool = False):
    """One-call API: build the synthesizer, make the noise pastiche, run.

    Returns (output NHWC float32 jnp array, wall seconds).
    """
    synth = Synthesizer(cfg)
    run_key = synth.next_run_key()
    if pastiche is None:
        shape = content.shape if content is not None else \
            (cfg.batch, cfg.size, cfg.out_width or cfg.size, 3)
        pastiche = jax.random.uniform(jax.random.fold_in(run_key, 999), shape,
                                      dtype=jnp.float32)
    t0 = time.time()
    out = synth.run(pastiche, styles, content, verbose=verbose, key=run_key)
    out.block_until_ready()
    return out, time.time() - t0

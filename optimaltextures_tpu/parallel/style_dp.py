"""Style-parallel synthesis: N DIFFERENT styles, one per device.

The reference's only batch axis is N noise pastiches matched against ONE
style with JOINT statistics (``--batch``, optex.py:225,263 — SURVEY §2.2).
A production texture service wants the transpose: one request per style,
served concurrently. Here the batch axis carries (pastiche_i, style_i)
PAIRS: per-device transport statistics are local by construction (each
style's mean/covariance/samples belong to its own shard), so the stage is
collective-free — pure throughput scaling over ICI-connected chips, the
embarrassingly-parallel "expert-per-device" layout. Rotations still come
from the shared `stage_rotations` stream (same key on every device), so a
style-parallel run is bit-comparable with N independent single-chip runs.

The conv encode/decode batches across the style axis for free (XLA
partitions the batch dim); only the OT statistics differ per shard.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .. import transport
from ..models.vgg import decode, encode

HIGHEST = jax.lax.Precision.HIGHEST


def per_style_stats(style_feats: jnp.ndarray, need_samples: bool):
    """(N, H, W, C) style features -> stacked per-style transport stats.

    mu: (N, 1, 1, C); cov: (N, C, C); samples: (N, H*W, C) or None.
    """
    n, h, w, c = style_feats.shape
    mu = jnp.mean(style_feats, axis=(1, 2), keepdims=True)
    xc = (style_feats - mu).reshape(n, h * w, c)
    cov = jnp.einsum("nsc,nsd->ncd", xc, xc, precision=HIGHEST) / (h * w)
    samples = style_feats.reshape(n, h * w, c) if need_samples else None
    return mu, cov, samples


# ---------------------------------------------------------------------------
# Full-featured style-parallel synthesis: PCA (bucketed per-style ranks) +
# multires (r2 VERDICT next-step #5 — the restrictions are lifted)


@partial(jax.jit, static_argnames=("depth", "use_pca", "need_samples"))
def _ep_spectra_jit(enc_params, style_stack, *, depth: int, use_pca: bool,
                    need_samples: bool):
    """Multi-tap encode the style stack + PER-STYLE PCA spectra per depth
    (scalar-mean centering + Gram + eigh, vmapped over the style axis) — one
    fused program per distinct pass size. Deepest-first order."""
    from ..models.vgg import encode_taps

    taps = encode_taps(enc_params, depth,
                       style_stack.astype(enc_params[0][0].dtype))
    out = []
    for d in range(depth, 0, -1):
        sf = taps[d - 1].astype(jnp.float32)           # (N, h, w, C)
        if not use_pca:
            out.append((sf, None, None))
            continue

        def spectrum(one):                              # (h, w, C)
            c = one.shape[-1]
            x = one.reshape(-1, c) - one.mean()         # scalar mean, optex.py:182
            g = jnp.matmul(x.T, x, precision=HIGHEST)
            eva, eve = jnp.linalg.eigh(g)
            return jnp.sqrt(jnp.maximum(eva[::-1], 0.0)), eve[:, ::-1]

        s, v = jax.vmap(spectrum)(sf)                   # (N, C), (N, C, C)
        out.append((sf, s, v))
    return out


@jax.jit
def _ep_traced_ks_jit(svals):
    """Per-style traced ranks (N, C) -> (N,) — the pca_traced_k rule on
    device (see core._traced_ks_jit; f32 cumsum, so a spectrum sitting
    within f32 rounding of the 0.9 threshold may flip k by one vs the host
    rule — the boundary component carries a negligible spectrum share)."""
    frac = jnp.cumsum(svals, axis=1) / jnp.sum(svals, axis=1, keepdims=True)
    return jnp.maximum(jnp.argmax(frac > 0.9, axis=1).astype(jnp.int32), 1)


@partial(jax.jit, static_argnames=("ks", "need_samples"))
def _ep_stats_jit(sfs, vs, true_ks, *, ks, need_samples: bool):
    """Per-depth: zero-pad each style's eigvecs to the SHARED static width
    K_d (columns >= that style's true rank zeroed), Newton-Schulz-polish the
    basis, project, and take per-style transport stats — one fused program.

    The shared width is what makes per-style ranks shape-stable across the
    mesh: the masked-rotation construction (ops.rotation.
    stage_rotations_masked) keeps each style's padded dims exactly zero, so
    the bucketed computation equals the exact-k one per style."""
    out = []
    for sf, v, tks, k in zip(sfs, vs, true_ks, ks):
        if not k:
            n, h, w, c = sf.shape
            mu = jnp.mean(sf, axis=(1, 2), keepdims=True)
            xc = (sf - mu).reshape(n, h * w, c)
            cov = jnp.einsum("nsc,nsd->ncd", xc, xc,
                             precision=HIGHEST) / (h * w)
            samples = sf.reshape(n, h * w, c) if need_samples else None
            out.append((None, mu, cov, samples))
            continue
        eig = v[:, :, :k]                               # (N, C, K)
        col = jax.lax.broadcasted_iota(jnp.int32, eig.shape, 2)
        eig = jnp.where(col < tks[:, None, None], eig, 0.0)
        for _ in range(3):                              # NS polish (see core)
            vtv = jnp.einsum("nck,ncl->nkl", eig, eig, precision=HIGHEST)
            eig = 1.5 * eig - 0.5 * jnp.einsum("nck,nkl->ncl", eig, vtv,
                                               precision=HIGHEST)
        proj = jnp.einsum("nhwc,nck->nhwk", sf, eig, precision=HIGHEST)
        n, h, w, _ = proj.shape
        mu = jnp.mean(proj, axis=(1, 2), keepdims=True)
        xc = (proj - mu).reshape(n, h * w, k)
        cov = jnp.einsum("nsc,nsd->ncd", xc, xc, precision=HIGHEST) / (h * w)
        samples = proj.reshape(n, h * w, k) if need_samples else None
        out.append((eig, mu, cov, samples))
    return out


def _ep_pass_body(depths, iters, mode, pca_flags, cov_prop, use_pallas,
                  enc_list, dec_list, pastiche, mus, covs, samples,
                  eigvecs, k_masks, key):
    """One device's whole-pass body: a single (pastiche, style) pair —
    encode -> project onto the LOCAL style's (zero-padded) basis ->
    masked-rotation transport on local stats -> unproject -> decode, all
    layers chained. ``mus[i]`` etc. carry a leading style axis of length 1
    (the local shard). Shared verbatim between the shard_map pass and the
    single-device reference mode, so the two are the same math by
    construction."""
    from .. import transport as T

    conv_dtype = enc_list[0][0][0].dtype
    pastiche = pastiche.astype(conv_dtype)
    for i, d in enumerate(depths):
        feat = encode(enc_list[i], d, pastiche).astype(jnp.float32)
        if pca_flags[i]:
            feat = jnp.matmul(feat, eigvecs[i][0], precision=HIGHEST)
        stats = T.StyleStats(
            mus[i][0], covs[i][0],
            samples[i][0] if samples[i] is not None else None)
        feat = T.transport_loop(
            jax.random.fold_in(key, i), feat, stats, iters[i], mode,
            k_mask=(k_masks[i][0] if k_masks[i] is not None else None),
            cov_prop=cov_prop, use_pallas=use_pallas)
        if pca_flags[i]:
            feat = jnp.matmul(feat, eigvecs[i][0].T, precision=HIGHEST)
        pastiche = decode(dec_list[i], d, feat.astype(conv_dtype))
    return pastiche.astype(jnp.float32)


_ep_resize_jit = None  # bound lazily below (module import order)


def _get_ep_resize():
    global _ep_resize_jit
    if _ep_resize_jit is None:
        from ..ops.resize import resize_nhwc

        _ep_resize_jit = jax.jit(resize_nhwc, static_argnums=(1,))
    return _ep_resize_jit


_EP_PASS_CACHE = {}


def make_style_parallel_pass(mesh: Mesh, *, depths, iters, mode: str,
                             pca_flags, axis: str = "data",
                             cov_prop=None, use_pallas=None):
    """ALL of a pass's layers in ONE shard_map program, one (pastiche_i,
    style_i) pair per device (see :func:`_ep_pass_body`). Collective-free
    (per-style statistics are local by construction). ``mesh=None`` returns
    a jitted single-device variant of the same body (the reference mode —
    used for 1-chip serving and the equality tests).

    Builders are cached module-level (jax.Mesh hashes by value, so a
    recreated identical mesh hits): without this, every serving request
    re-traced its pass programs (~1.3 s/request host time on the 1-core
    VM — measured in the r3 on-chip smoke)."""
    key = (mesh, depths, iters, mode, pca_flags, axis, cov_prop, use_pallas)
    if key in _EP_PASS_CACHE:
        return _EP_PASS_CACHE[key]
    body = partial(_ep_pass_body, depths, iters, mode, pca_flags, cov_prop,
                   use_pallas)
    if mesh is None:
        fn = jax.jit(body, donate_argnums=(2,))
    else:
        shard = P(axis)
        rep = P()
        fn = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(rep, rep, shard, shard, shard, shard, shard, shard,
                      rep),
            out_specs=shard), donate_argnums=(2,))
    while len(_EP_PASS_CACHE) > 64:
        _EP_PASS_CACHE.pop(next(iter(_EP_PASS_CACHE)))
    _EP_PASS_CACHE[key] = fn
    return fn


def synthesize_style_batch(cfg, styles, mesh: Mesh, verbose: bool = False,
                           pastiche=None, bank=None, _force_widths=None):
    """Full style-parallel synthesis WITHOUT the r2 restrictions: one
    pastiche per style, one style per device, with PCA (per-style ranks,
    bucketed to a shared static width per depth) and the full multires
    schedule (per-pass batched style/pastiche resizes; the resize gate
    mirrors encode_inputs, optex.py:47). ``styles`` must share a shape.

    Per-style k varies, so program widths use the max bucketed rank across
    the batch (bucket = cfg.pca_bucket, default 32 here since bucketing is
    what makes ragged ranks shape-stable); each style's true rank rides
    along as a sharded traced scalar driving blockdiag(SO(k_i), I)
    rotations — mathematically the exact-k computation per style.

    ``pastiche``: optional (N, size, size, 3) starting noise (tests inject
    identical noise across mesh sizes); default keyed uniform noise.
    ``_force_widths``: per-depth static width override (tests pin it so an
    8-device run and a 1-device run draw identical rotation streams).
    Returns (N, H, W, 3).
    """
    from ..models.vgg import VGGBank
    from ..utils import schedule
    from .mesh import batch_sharding

    import numpy as np

    n = len(styles)
    if mesh is not None and n != mesh.devices.size:
        raise ValueError(f"{n} styles for {mesh.devices.size} devices")
    if len({tuple(s.shape) for s in styles}) != 1:
        raise ValueError("style-parallel synthesis needs equal style shapes")
    if getattr(cfg, "batch_chunk", 0):
        # Explicit rejection (VERDICT r4 #8): EP runs ONE image per style
        # per device — there is no local batch axis to micro-batch, so
        # batch_chunk has nothing to chunk here. (DP x batch_chunk is the
        # supported composition: shard_ot._chunked_stage_local.)
        raise ValueError("batch_chunk does not compose with style_parallel "
                         "(one image per style per device — no local batch "
                         "axis to chunk); use num_devices DP for chunked "
                         "batches")

    cfg = cfg.validate()
    # a caller-supplied bank (e.g. a warm serving pool's) skips the weight
    # re-upload; its dtype must match the requested conv dtype
    if bank is None:
        bank = VGGBank(cfg.depth, dtype=jnp.dtype(cfg.conv_dtype))
    depth = bank.max_depth
    use_pca = not cfg.no_pca
    # pca_bucket=0 (exact-k) cannot be honored here: per-style ranks are
    # ragged, and bucketing is what makes them shape-stable across the
    # style axis. The substitution is exact math (zero-padded bases +
    # blockdiag(SO(k_i), I) rotations) but callers should know their
    # default changed (ADVICE r3) — say so once.
    bucket = cfg.pca_bucket or 32
    if use_pca and not cfg.pca_bucket and not cfg.pca_traced_k:
        import warnings

        warnings.warn(
            "style_parallel forces pca_bucket=32 (exact-k / pca_bucket=0 "
            "is unavailable on the style axis; math is unchanged — padded "
            "bases + true-rank masked rotations)", stacklevel=2)
    need_samples = cfg.hist_mode in ("cdf", "sort")
    iters_table, sizes = schedule.iters_and_sizes(
        cfg.size, cfg.iters, cfg.passes, not cfg.no_multires,
        quirk=cfg.compat_schedule_quirk, num_layers=depth)
    layer_depths = [depth - l for l in range(depth)]

    seed = cfg.seed if cfg.seed is not None else \
        np.random.SeedSequence().entropy % (2 ** 63)
    key = jax.random.key(int(seed))

    style_stack0 = jnp.concatenate([jnp.asarray(s) for s in styles], axis=0)
    if pastiche is None:
        pastiche = jax.random.uniform(
            jax.random.fold_in(key, 999), (n, cfg.size, cfg.size, 3),
            jnp.float32)
    else:
        # copy: the pass programs donate their input buffer (CLAUDE.md
        # invariant — a caller-supplied array must survive the run)
        pastiche = jnp.array(pastiche, dtype=jnp.float32, copy=True)
    if mesh is not None:
        pastiche = jax.device_put(pastiche, batch_sharding(mesh))

    # per distinct pass size: one spectra program + one k-decision + one
    # stats program (the gate means a no_multires run preps once)
    preps = {}
    enc_full = bank.enc_params[depth]

    def prep_for(size: int, do_resize: bool):
        ck = size if do_resize else None
        if ck in preps:
            return preps[ck]
        if do_resize:
            h0, w0 = style_stack0.shape[1:3]
            tgt = schedule.get_size(size, cfg.style_scale, h0, w0)
            stack = _get_ep_resize()(style_stack0, tgt)
        else:
            stack = style_stack0
        spectra = _ep_spectra_jit(enc_full, stack, depth=depth,
                                  use_pca=use_pca, need_samples=need_samples)
        if use_pca and cfg.pca_traced_k:
            # zero host syncs: full static width, per-style traced ranks
            widths = [sf.shape[-1] for (sf, _, _) in spectra]
            masks = [_ep_traced_ks_jit(sv) for (_, sv, _) in spectra]
            if _force_widths is not None:
                widths = list(_force_widths)
        elif use_pca:
            # ONE batched eigenvalue fetch for the whole pass (tunnel RTT)
            flat = np.asarray(jnp.concatenate(
                [s.reshape(-1) for (_, s, _) in spectra]))
            widths, masks = [], []
            off = 0
            for di, (sf, s, v) in enumerate(spectra):
                c = sf.shape[-1]
                ks = []
                from .. import transport as T

                for j in range(n):
                    ks.append(T.choose_k(flat[off + j * c: off + (j + 1) * c]))
                off += n * c
                k_stat = min(-(-max(ks) // bucket) * bucket, c)
                if _force_widths is not None:
                    k_stat = _force_widths[di]
                widths.append(k_stat)
                masks.append(jnp.asarray(ks, jnp.int32))
        else:
            widths = [0] * depth
            masks = [None] * depth
        stats = _ep_stats_jit(tuple(sf for (sf, _, _) in spectra),
                              tuple(v for (_, _, v) in spectra),
                              tuple(masks), ks=tuple(widths),
                              need_samples=need_samples)
        preps[ck] = (widths, masks, stats)
        return preps[ck]

    passes_cache = {}
    bsh = batch_sharding(mesh) if mesh is not None else None
    cur_hw = (cfg.size, cfg.size)
    for p in range(cfg.passes):
        size = sizes[p]
        do_resize = cur_hw[0] != size and cur_hw[1] != size
        if do_resize:
            pastiche = _get_ep_resize()(pastiche, (size, size))
            if bsh is not None:
                pastiche = jax.device_put(pastiche, bsh)
            cur_hw = (size, size)
        widths, masks, stats = prep_for(size, do_resize)
        if verbose:
            print(f"Pass {p}, size {size} (style-parallel x{n}, "
                  f"widths {widths})", flush=True)
        pass_key = jax.random.fold_in(key, p)
        iters = tuple(int(i) for i in iters_table[p])
        pca_flags = tuple(bool(w) for w in widths)
        sk = (iters, pca_flags, tuple(widths), cur_hw)
        if sk not in passes_cache:
            passes_cache[sk] = make_style_parallel_pass(
                mesh, depths=tuple(layer_depths), iters=iters,
                mode=cfg.hist_mode, pca_flags=pca_flags,
                cov_prop=cfg.cov_propagation,
                use_pallas=None if cfg.use_pallas else False)
        enc_list = tuple(bank.enc_params[d] for d in layer_depths)
        dec_list = tuple(bank.dec_params[d] for d in layer_depths)
        mus = tuple(mu for (_, mu, _, _) in stats)
        covs = tuple(cov for (_, _, cov, _) in stats)
        sams = tuple(sm for (_, _, _, sm) in stats)
        eigs = tuple(eig for (eig, _, _, _) in stats)
        kms = tuple(masks)
        if mesh is None:
            # single-device reference mode: the SAME per-style pass body,
            # applied style by style (1-chip serving / equality oracle)
            sl = lambda t, i: (None if t is None else t[i:i + 1])
            outs = [passes_cache[sk](
                enc_list, dec_list, pastiche[i:i + 1],
                tuple(sl(m, i) for m in mus), tuple(sl(c, i) for c in covs),
                tuple(sl(sm, i) for sm in sams),
                tuple(sl(e, i) for e in eigs), tuple(sl(k, i) for k in kms),
                pass_key) for i in range(n)]
            pastiche = jnp.concatenate(outs, axis=0)
        else:
            pastiche = passes_cache[sk](enc_list, dec_list, pastiche, mus,
                                        covs, sams, eigs, kms, pass_key)
    return pastiche

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


def _local_stage(depth, n_iters, mode, enc_params, dec_params, pastiche,
                 style_mu, style_cov, style_samples, key):
    """One device's share: a single (pastiche, style) pair, plain local
    transport — the single-device math verbatim, no collectives."""
    feat = encode(enc_params, depth, pastiche).astype(jnp.float32)
    stats = transport.StyleStats(
        style_mu[0], style_cov[0],
        style_samples[0] if style_samples is not None else None)
    feat = transport.transport_loop(key, feat, stats, n_iters, mode)
    return decode(dec_params, depth, feat.astype(pastiche.dtype))


def make_style_parallel_stage(mesh: Mesh, depth: int, n_iters: int,
                              mode: str, axis: str = "data"):
    """Jitted stage over N (pastiche, style) pairs sharded one-per-device.

    fn(enc_params, dec_params, pastiche (N,H,W,3)-sharded, style_mu (N,1,1,C),
    style_cov (N,C,C), style_samples (N,S,C)|None, key) -> pastiche.
    Statistics shard WITH the pastiche; rotations are key-shared.
    """
    shard = P(axis)
    rep = P()

    def stage_local(enc_params, dec_params, pastiche, style_mu, style_cov,
                    style_samples, key):
        return _local_stage(depth, n_iters, mode, enc_params, dec_params,
                            pastiche, style_mu, style_cov, style_samples, key)

    fn = jax.shard_map(stage_local, mesh=mesh,
                       in_specs=(rep, rep, shard, shard, shard, shard, rep),
                       out_specs=shard)
    return jax.jit(fn, donate_argnums=(2,))


@partial(jax.jit, static_argnames=("depth", "need_samples"))
def _all_depth_stats_jit(enc_params, style_stack, *, depth: int,
                         need_samples: bool):
    """One fused program: multi-tap encode the style stack at every depth +
    per-style stats per depth (deepest-first, layer-loop order)."""
    from ..models.vgg import encode_taps

    taps = encode_taps(enc_params, depth,
                       style_stack.astype(enc_params[0][0].dtype))
    return [per_style_stats(taps[d - 1].astype(jnp.float32), need_samples)
            for d in range(depth, 0, -1)]


def synthesize_styles(cfg, styles, mesh: Mesh, verbose: bool = False):
    """Full style-parallel synthesis: one pastiche per style, one style per
    device. ``styles`` must share a shape (stacked on the batch axis).

    Per-style PCA ranks / multires style resizes would force ragged shapes
    across devices, so this serving-throughput path runs the no-PCA uniform
    schedule at full size; the quality knobs (iters, size, hist_mode,
    passes) all apply. Styles never resize here, so their per-depth stats
    are computed ONCE (one fused multi-tap program). Returns (N, H, W, 3).
    """
    from ..models.vgg import VGGBank
    from ..utils import schedule
    from .mesh import batch_sharding

    import numpy as np

    n = len(styles)
    if n != mesh.devices.size:
        raise ValueError(f"{n} styles for {mesh.devices.size} devices")
    if len({tuple(s.shape) for s in styles}) != 1:
        raise ValueError("style-parallel synthesis needs equal style shapes")

    cfg = cfg.validate()
    bank = VGGBank(cfg.depth, dtype=jnp.dtype(cfg.conv_dtype))
    depth = bank.max_depth
    iters_table, _ = schedule.iters_and_sizes(
        cfg.size, cfg.iters, cfg.passes, False,  # uniform schedule (see doc)
        quirk=cfg.compat_schedule_quirk, num_layers=depth)
    layer_depths = [depth - l for l in range(depth)]

    seed = cfg.seed if cfg.seed is not None else \
        np.random.SeedSequence().entropy % (2 ** 63)
    key = jax.random.key(int(seed))
    need_samples = cfg.hist_mode in ("cdf", "sort")

    style_stack = jnp.concatenate([jnp.asarray(s) for s in styles], axis=0)
    style_stack = jax.device_put(style_stack, batch_sharding(mesh))
    pastiche = jax.random.uniform(
        jax.random.fold_in(key, 999), (n, cfg.size, cfg.size, 3), jnp.float32)
    pastiche = jax.device_put(pastiche, batch_sharding(mesh))

    stats = _all_depth_stats_jit(bank.enc_params[depth], style_stack,
                                 depth=depth, need_samples=need_samples)

    conv_dtype = bank.enc_params[depth][0][0].dtype
    stages = {}
    for p in range(cfg.passes):
        if verbose:
            print(f"Pass {p} (style-parallel x{n})", flush=True)
        pass_key = jax.random.fold_in(key, p)
        for l, d in enumerate(layer_depths):
            mu, cov, samples = stats[l]
            sk = (d, int(iters_table[p][l]))
            if sk not in stages:
                stages[sk] = make_style_parallel_stage(
                    mesh, depth=d, n_iters=int(iters_table[p][l]),
                    mode=cfg.hist_mode)
            pastiche = stages[sk](
                bank.enc_params[d], bank.dec_params[d],
                pastiche.astype(conv_dtype), mu, cov, samples,
                jax.random.fold_in(pass_key, l)).astype(jnp.float32)
    return pastiche

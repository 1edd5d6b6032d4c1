"""Spatial (height-axis) sharding: run ONE huge image across many chips.

The reference's only scaling axis is image resolution (SURVEY §5: no
attention, no sequence — resolution is the analogue). Beyond ~2048px a single
chip runs out of appetite; here the image's H axis is sharded over the mesh
and every component of the pipeline becomes SPMD:

* 3x3 convs exchange 1-row halos with ``lax.ppermute`` (reflection padding
  applies only at the global top/bottom edges, selected by ``axis_index``);
* 2x2 pools/upsamples never straddle shard boundaries as long as each local
  H stays even — guaranteed when H_global is divisible by
  ``n_devices * 2**(depth-1)`` (checked host-side);
* OT moments psum partial Gram matrices (the "sequence-parallel sliced OT"
  of SURVEY §5): per-image means AND covariances are global reductions here,
  unlike batch-DP where means stay local.

This module provides the halo-exchange conv stack and a fully sharded
(encode -> OT loop -> decode) stage builder.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models import arch
from ..ops.convops import conv2d_nhwc, maxpool_2x2_ceil, upsample_nearest_2x
from ..ops import histmatch
from ..ops.rotation import random_rotation

HIGHEST = jax.lax.Precision.HIGHEST


def _halo_pad_h(x: jnp.ndarray, axis: str,
                pad_mode: str = "reflect") -> jnp.ndarray:
    """Pad the sharded H axis by 1 row on each side: interior rows come from
    the neighbouring shard (ppermute); global edges reflect locally
    (reference semantics) or wrap around the ring (tileable — the circular
    ppermute is actually SIMPLER than reflection: shard 0's top halo is just
    shard n-1's last row, no edge special-case)."""
    n = jax.lax.axis_size(axis)
    if pad_mode == "wrap":
        ring_down = [(i, (i + 1) % n) for i in range(n)]
        ring_up = [((i + 1) % n, i) for i in range(n)]
        top = jax.lax.ppermute(x[:, -1:], axis, ring_down)
        bot = jax.lax.ppermute(x[:, :1], axis, ring_up)
        return jnp.concatenate([top, x, bot], axis=1)
    idx = jax.lax.axis_index(axis)
    # row sent downward (to shard i+1) is our last row; upward is our first
    perm_down = [(i, i + 1) for i in range(n - 1)]
    perm_up = [(i + 1, i) for i in range(n - 1)]
    from_above = jax.lax.ppermute(x[:, -1:], axis, perm_down)   # valid on i>0
    from_below = jax.lax.ppermute(x[:, :1], axis, perm_up)      # valid on i<n-1
    # reflection (exclude-edge, torch ReflectionPad2d) at the global borders
    top = jnp.where(idx == 0, x[:, 1:2], from_above)
    bot = jnp.where(idx == n - 1, x[:, -2:-1], from_below)
    return jnp.concatenate([top, x, bot], axis=1)


def _pad_w(x: jnp.ndarray, pad_mode: str = "reflect") -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)),
                   mode="reflect" if pad_mode == "reflect" else "wrap")


def run_stack_spatial(params, specs, x: jnp.ndarray, axis: str,
                      pad_mode: str = "reflect") -> jnp.ndarray:
    """The VGG conv stack with H sharded: halo-exchange instead of local
    reflection padding on H. Mirrors models.vgg._run_stack op-for-op."""
    for (w, b), (_, _, k, pre, post) in zip(params, specs):
        if pre == "pool":
            x = maxpool_2x2_ceil(x)
        elif pre == "up":
            x = upsample_nearest_2x(x)
        if k == 3:
            x = _pad_w(_halo_pad_h(x, axis, pad_mode), pad_mode)
        x = conv2d_nhwc(x, w, b)
        if post == "relu":
            x = jax.nn.relu(x)
    return x


def encode_spatial(params, depth: int, img: jnp.ndarray, axis: str,
                   pad_mode: str = "reflect") -> jnp.ndarray:
    return run_stack_spatial(params, arch.encoder_specs(depth), img, axis,
                             pad_mode)


def decode_spatial(params, depth: int, feat: jnp.ndarray, axis: str,
                   pad_mode: str = "reflect") -> jnp.ndarray:
    return run_stack_spatial(params, arch.decoder_specs(depth), feat, axis,
                             pad_mode)


def _global_moments(x: jnp.ndarray, axis: str):
    """Spatially-sharded moments: mean AND covariance reduce over the mesh."""
    c = x.shape[-1]
    n_dev = jax.lax.psum(1, axis)
    local_n = x.shape[0] * x.shape[1] * x.shape[2]
    total = local_n * n_dev
    mean = jax.lax.psum(jnp.sum(x, axis=(1, 2), keepdims=True), axis) / (
        x.shape[1] * x.shape[2] * n_dev)
    xc = (x - mean).reshape(-1, c)
    gram = jax.lax.psum(jnp.matmul(xc.T, xc, precision=HIGHEST), axis)
    return mean, xc, gram / total


def ot_step_moment_spatial(key, feature, style_mu, style_cov_raw, mode: str,
                           axis: str, eps: float = 1.0):
    """One sliced-OT step on an H-sharded feature map (exact global stats)."""
    rot = random_rotation(key, feature.shape[-1])
    return _moment_step_spatial(rot, feature, style_mu, style_cov_raw, mode,
                                axis, eps)


def _moment_step_spatial(rot, feature, style_mu, style_cov_raw, mode: str,
                         axis: str, eps: float = 1.0, sfactor=None):
    c = feature.shape[-1]
    mu_t, xc, cov_t_raw = _global_moments(feature, axis)
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


def spatial_transport_loop(key, feature, style_mu, style_cov_raw,
                           n_iters: int, mode: str, axis: str,
                           style_samples=None, content_feature=None,
                           content_strength: float = 0.0, k_mask=None,
                           cov_prop=None):
    """The OT loop on an H-sharded feature map — the sequence-parallel
    layout of :func:`shard_ot.sharded_transport_loop_axes`: means AND the
    pooled covariance reduce over the space axis (fully global moments);
    cdf ranges/histograms psum over it; sort runs the exact distributed
    sort along it. The content pull is elementwise, so an H-sharded content
    feature map applies shard-locally."""
    from .shard_ot import sharded_transport_loop_axes

    return sharded_transport_loop_axes(
        key, feature, style_mu, style_cov_raw, n_iters, mode,
        mean_axes=(axis,), gram_axes=(axis,), sort_axis=axis,
        style_samples=style_samples, content_feature=content_feature,
        content_strength=content_strength, k_mask=k_mask, cov_prop=cov_prop)


def make_spatial_pass(mesh: Mesh, *, depths, iters, mode: str, strengths,
                      pca_flags, axis: str = "space",
                      pad_mode: str = "reflect", cov_prop=None):
    """ALL of a pass's layer stages in ONE shard_map program over an
    H-sharded image — the spatial twin of ``shard_ot.make_sharded_pass``
    (see its docstring for the dispatch rationale). Halo-exchange convs per
    layer; content features arrive H-sharded like the pastiche's features
    (the content pull is elementwise). The pass's multires resize stays
    standalone: bicubic taps cross shard boundaries, so resizing runs as a
    plain jitted global op, not inside shard_map.
    """
    shard = P(None, axis, None, None)
    rep = P()

    def pass_local(enc_list, dec_list, pastiche, mus, covs, samples,
                   eigvecs, contents, key, k_masks):
        conv_dtype = enc_list[0][0][0].dtype
        pastiche = pastiche.astype(conv_dtype)
        for i, d in enumerate(depths):
            feat = encode_spatial(enc_list[i], d, pastiche, axis, pad_mode)
            feat = feat.astype(jnp.float32)
            if pca_flags[i]:
                feat = jnp.matmul(feat, eigvecs[i], precision=HIGHEST)
            feat = spatial_transport_loop(
                jax.random.fold_in(key, i), feat, mus[i], covs[i],
                iters[i], mode, axis, style_samples=samples[i],
                content_feature=contents[i], content_strength=strengths[i],
                k_mask=k_masks[i], cov_prop=cov_prop)
            if pca_flags[i]:
                feat = jnp.matmul(feat, eigvecs[i].T, precision=HIGHEST)
            pastiche = decode_spatial(dec_list[i], d, feat.astype(conv_dtype),
                                      axis, pad_mode)
        return pastiche.astype(jnp.float32)

    fn = jax.shard_map(
        pass_local, mesh=mesh,
        in_specs=(rep, rep, shard, rep, rep, rep, rep, shard, rep, rep),
        out_specs=shard)
    return jax.jit(fn, donate_argnums=(2,))


def check_spatial_divisibility(h: int, n_devices: int, depth: int) -> None:
    need = n_devices * (2 ** (depth - 1))
    if h % need != 0:
        raise ValueError(
            f"H={h} must be divisible by n_devices*2^(depth-1)={need} for "
            f"spatial sharding at depth {depth}")

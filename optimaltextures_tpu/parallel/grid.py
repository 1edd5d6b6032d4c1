"""2-D (batch x height) mesh: DP and SP composed on one device grid.

The reference is single-device (SURVEY §2.2); rounds 1-2 added batch-DP
("data" axis, per-image means local, covariance psum'd) and spatial SP
("space" axis, halo-exchange convs, fully global moments) as mutually
exclusive 1-D meshes. This module composes them: a (num_devices x
spatial_devices) mesh where every image's H axis is sharded across the
"space" ring AND the batch is sharded across "data" — e.g. batch 2 of
4096px images on 8 chips as a 2x4 grid.

What changes relative to the 1-D paths:

* convs: halo exchange rides the "space" axis only (the batch dim is
  embarrassingly parallel) — `spatial.run_stack_spatial` is reused as-is;
* moment modes: per-(image, channel) means reduce over "space" only, the
  pooled covariance Gram psums over BOTH axes — the exact joint statistics
  of the single-device batch;
* cdf: the range (pmin/pmax) and the 256-bin target histogram reduce over
  both axes — `shard_ot._cdf_step_sharded` is axis-generic and takes the
  axis TUPLE directly;
* sort: rejected on the grid (the exact distributed sort's gather-order
  argument is per-axis; use a 1-D mesh for sort, or cdf here).

Rotations come from the same `stage_rotations` stream (same key on every
device), so grid runs are float-tolerance equal to the single-device run
(tested on a virtual 2x4 mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np

from .spatial import decode_spatial, encode_spatial

HIGHEST = jax.lax.Precision.HIGHEST


def make_grid_mesh(n_data: int, n_space: int) -> Mesh:
    devs = jax.devices()
    need = n_data * n_space
    if need > len(devs):
        raise ValueError(f"requested {need} devices, have {len(devs)}")
    return Mesh(np.array(devs[:need]).reshape(n_data, n_space),
                ("data", "space"))


def grid_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data", "space", None, None))


def grid_transport_loop(key, feature, style_mu, style_cov_raw, n_iters: int,
                        mode: str, baxis: str, saxis: str,
                        style_samples=None, content_feature=None,
                        content_strength: float = 0.0, k_mask=None,
                        cov_prop=None):
    """The OT loop on a (batch, H)-grid-sharded feature map — the 2-D
    layout of :func:`shard_ot.sharded_transport_loop_axes`: per-image means
    reduce over the space ring only, the pooled covariance (and cdf
    ranges/histograms) over the whole grid; sort runs the EXACT distributed
    sort via the two-step order-recovering gather (r4,
    :func:`shard_ot._sort_step_grid`)."""
    from .shard_ot import sharded_transport_loop_axes

    return sharded_transport_loop_axes(
        key, feature, style_mu, style_cov_raw, n_iters, mode,
        mean_axes=(saxis,), gram_axes=(baxis, saxis),
        sort_axis=(baxis, saxis),
        style_samples=style_samples, content_feature=content_feature,
        content_strength=content_strength, k_mask=k_mask, cov_prop=cov_prop)


def make_grid_pass(mesh: Mesh, *, depths, iters, mode: str, strengths,
                   pca_flags, baxis: str = "data", saxis: str = "space",
                   pad_mode: str = "reflect", cov_prop=None):
    """ALL of a pass's layers in ONE shard_map program over the 2-D grid
    (the DPxSP twin of shard_ot.make_sharded_pass / spatial.
    make_spatial_pass). Pastiche shards (batch, H); halo convs ride the
    space axis; statistics reduce per :func:`_grid_moments`."""
    shard = P(baxis, saxis, None, None)
    rep = P()

    def pass_local(enc_list, dec_list, pastiche, mus, covs, samples,
                   eigvecs, contents, key, k_masks):
        conv_dtype = enc_list[0][0][0].dtype
        pastiche = pastiche.astype(conv_dtype)
        for i, d in enumerate(depths):
            feat = encode_spatial(enc_list[i], d, pastiche, saxis, pad_mode)
            feat = feat.astype(jnp.float32)
            if pca_flags[i]:
                feat = jnp.matmul(feat, eigvecs[i], precision=HIGHEST)
            feat = grid_transport_loop(
                jax.random.fold_in(key, i), feat, mus[i], covs[i],
                iters[i], mode, baxis, saxis, style_samples=samples[i],
                content_feature=contents[i], content_strength=strengths[i],
                k_mask=k_masks[i], cov_prop=cov_prop)
            if pca_flags[i]:
                feat = jnp.matmul(feat, eigvecs[i].T, precision=HIGHEST)
            pastiche = decode_spatial(dec_list[i], d,
                                      feat.astype(conv_dtype), saxis,
                                      pad_mode)
        return pastiche.astype(jnp.float32)

    fn = jax.shard_map(
        pass_local, mesh=mesh,
        in_specs=(rep, rep, shard, rep, rep, rep, rep, rep, rep, rep),
        out_specs=shard)
    return jax.jit(fn, donate_argnums=(2,))

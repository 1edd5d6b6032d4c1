"""Pallas TPU kernel: the per-sample half of cdf matching, gather-free.

Replaces the r1 ``cdf_remap`` kernel's per-sample stage (compare-count
searchsorted + four 256-wide one-hot lookups, ~6 VPU passes of N x 256) with
two structural wins (round 4, VERDICT r3 next-step #1):

1. The xp table of the final interp is the UNIFORM bin-edge grid, so
   torch.searchsorted('left') collapses to O(1) arithmetic per sample:
   ``idx = #(edges < x) = clip(ceil((x - lo)/step) - 1, 0, 255)``.
2. The fp lookups (``remapped[idx]``, ``remapped[idx+1]``) factor through
   16 x 16 one-hots: with P = remapped reshaped (16, 16),
   ``remapped[16h + l] = sum_h E_hi[h] * (P @ E_lo)[h]`` — one (16,16) x
   (16,BN) matmul on the MXU plus two 16-wide VPU compares per sample,
   instead of a 256-wide one-hot multiply-reduce.

Per-sample VPU cost drops from ~1500 ops to ~100; the 256-entry table work
(cdfs, cdf->cdf remap) stays in XLA (it is ~256^2 per channel, negligible).

Numerics: identical to ``histmatch._pwl_apply_rows`` (the XLA twin) by
construction; vs the legacy searchsorted path, samples within ~1 ulp of a
bin edge may resolve to the adjacent segment — value-continuous at the node.

Reference semantics replicated (``/root/reference/histmatch.py:72-92``):
the idx==255 segment has xp_next == xp, so the reference's non-finite
fallback maps the whole last bin to remapped[-1]; a zero-width shared range
(constant channel) falls back to remapped[0].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BINS = 256
_BLOCK_C = 8
_G = 16  # factored one-hot group size (16 * 16 == BINS)


def _pwl_kernel(t_ref, pi_ref, pn_ref, lo_ref, step_ref, width_ref, out_ref):
    """Blocks: t/out (8, BN); pi/pn (8, 16, 16); lo/step/width (8, 1)."""
    bn = t_ref.shape[1]
    iota_g = jax.lax.broadcasted_iota(jnp.int32, (_G, bn), 0)
    for ch in range(_BLOCK_C):
        x = t_ref[ch, :]
        lo = lo_ref[ch, 0]
        step = step_ref[ch, 0]
        width = width_ref[ch, 0]
        step_safe = jnp.where(step > 0, step, 1.0)
        u = (x - lo) / step_safe
        j = jnp.clip(jnp.ceil(u).astype(jnp.int32) - 1, 0, BINS - 1)  # (BN,)
        jh = j // _G
        jl = j - jh * _G
        ehi = iota_g == jh[None, :]                                # (16, BN)
        elo = (iota_g == jl[None, :]).astype(jnp.float32)
        # A[h, n] = P[h, jl[n]]; then sum_h ehi -> P[jh[n], jl[n]]
        a_i = jnp.dot(pi_ref[ch], elo, preferred_element_type=jnp.float32)
        a_n = jnp.dot(pn_ref[ch], elo, preferred_element_type=jnp.float32)
        fp_i = jnp.sum(jnp.where(ehi, a_i, 0.0), axis=0)           # (BN,)
        fp_n = jnp.sum(jnp.where(ehi, a_n, 0.0), axis=0)
        jf = (j + 1).astype(jnp.float32)
        xp_i = lo + jf * step
        xp_n = lo + jnp.minimum(jf + 1.0, float(BINS)) * step
        slope = (fp_n - fp_i) / (xp_n - xp_i)
        f = slope * (x - xp_i) + fp_i
        f = jnp.where(j >= BINS - 1, fp_i, f)      # last bin -> remapped[-1]
        out_ref[ch, :] = jnp.where(width > 0, f, pi_ref[ch, 0, 0])


@partial(jax.jit, static_argnames=("block_n",))
def pwl_remap(t: jnp.ndarray, remapped: jnp.ndarray, lo: jnp.ndarray,
              hi: jnp.ndarray, block_n: int = 2048) -> jnp.ndarray:
    """(C, N) samples + per-channel (C, BINS) remapped tables + (C,) shared
    range -> matched samples: out = interp_ref(t; bin_edges(lo, hi),
    remapped) per channel. Channels pad to 8, samples to block_n (edge
    values; padding sliced away)."""
    c, n = t.shape
    cpad = (-c) % _BLOCK_C
    npad = (-n) % block_n
    if cpad or npad:
        t = jnp.pad(t, ((0, cpad), (0, npad)), mode="edge")
        remapped = jnp.pad(remapped, ((0, cpad), (0, 0)), mode="edge")
        lo = jnp.pad(lo, (0, cpad), mode="edge")
        hi = jnp.pad(hi, (0, cpad), mode="edge")

    cp, np_ = t.shape
    # idx_next clamps at BINS-1: P_next[l] = remapped[min(l+1, 255)]
    rnext = jnp.concatenate([remapped[:, 1:], remapped[:, -1:]], axis=1)
    pi = remapped.reshape(cp, _G, _G)
    pn = rnext.reshape(cp, _G, _G)
    width = (hi - lo)[:, None].astype(jnp.float32)
    step = width / float(BINS)

    grid = (cp // _BLOCK_C, np_ // block_n)
    out = pl.pallas_call(
        _pwl_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BLOCK_C, block_n), lambda i, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_C, _G, _G), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_C, _G, _G), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_C, 1), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_C, 1), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_C, 1), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK_C, block_n), lambda i, k: (i, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cp, np_), jnp.float32),
    )(t.astype(jnp.float32), pi, pn,
      lo[:, None].astype(jnp.float32), step, width)
    return out[:c, :n]

"""Pallas TPU kernel: fused CDF remap (the apply half of cdf matching).

Given per-channel 256-bin histograms of target and source (from
``histogram.batched_histogram``) and the shared bin range, this kernel
produces the matched values for every sample in one launch. Per channel:

  1. CDFs via a triangular matmul (exact cumsum on the MXU);
  2. the CDF->CDF remap table: searchsorted as a compare-count (256x256)
     and table lookups as ONE one-hot (256, 256) @ (256, 4) GEMM over the
     packed [xp, xp_next, fp, fp_next] tables;
  3. per sample block: compare-count bin index against the 256 right edges
     (exact torch.searchsorted 'left' semantics: idx = #(xp < x)), one
     one-hot (BN, 256) @ (256, 4) GEMM fetching all four interpolation
     tables, then the reference's branchless interp with its two-stage
     non-finite fallback (histmatch.py:72-92).

Why: XLA lowers the per-sample table gathers to scalarized loads on TPU
(~150 ms per sliced-OT iteration at 65k samples x 40 channels); one-hot
matmuls put the gather on the MXU instead.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BINS = 256


def _shift_down(v: jnp.ndarray) -> jnp.ndarray:
    """v[i] -> v[i+1] with the last entry clamped (idx_next = min(i+1, 255));
    v is (1, BINS). Implemented as a lane roll + masked scalar fix — Mosaic
    cannot lower a concatenate of offset-misaligned slices."""
    rolled = pltpu.roll(v, shift=BINS - 1, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(col == BINS - 1, v[0, BINS - 1], rolled)


def _interp_packed(x: jnp.ndarray, xp: jnp.ndarray, fp: jnp.ndarray
                   ) -> jnp.ndarray:
    """interp_ref(x; xp, fp) where xp/fp are (1, BINS) tables and x is
    (Q,) queries. Returns (Q,). One compare-count + one packed GEMM."""
    q = x.shape[0]
    # searchsorted 'left': idx = #(xp < x), clipped to BINS-1
    lt = (xp < x[:, None]).astype(jnp.int32)             # (Q, BINS)
    idx = jnp.minimum(jnp.sum(lt, axis=1), BINS - 1)
    ids = jax.lax.broadcasted_iota(jnp.int32, (q, BINS), 1)
    onehot = (ids == idx[:, None]).astype(jnp.float32)   # (Q, BINS)
    # table lookups as broadcast-multiply-reduce (VPU; Mosaic cannot lower
    # concats of offset-mismatched table rows into a packed GEMM operand)
    lookup = lambda table: jnp.sum(onehot * table, axis=1)
    xp_i = lookup(xp)
    xp_n = lookup(_shift_down(xp))
    fp_i = lookup(fp)
    fp_n = lookup(_shift_down(fp))
    slope = (fp_n - fp_i) / (xp_n - xp_i)
    f0 = slope * (x - xp_i) + fp_i
    f1 = slope * (x - xp_n) + fp_n
    return jnp.where(jnp.isfinite(f0), f0,
                     jnp.where(jnp.isfinite(f1), f1, fp_i))


_BLOCK_C = 8


def _remap_kernel(t_ref, t_hist_ref, s_hist_ref, lo_ref, hi_ref, out_ref):
    """Blocks: t (8, BN); hists (8, BINS); lo/hi (8, 1); out (8, BN).
    The 8-channel sublane block satisfies Mosaic's tiling constraint; the
    per-channel table work is unrolled (each channel has its own tables)."""
    # exact cumsum on the MXU: hist @ upper-triangular ones (all 8 channels)
    tri = (jax.lax.broadcasted_iota(jnp.int32, (BINS, BINS), 0) <=
           jax.lax.broadcasted_iota(jnp.int32, (BINS, BINS), 1)).astype(jnp.float32)
    t_cdf = jnp.dot(t_hist_ref[:], tri, preferred_element_type=jnp.float32)
    s_cdf = jnp.dot(s_hist_ref[:], tri, preferred_element_type=jnp.float32)
    t_cdf = t_cdf / t_cdf[:, -1:]
    s_cdf = s_cdf / s_cdf[:, -1:]

    j = jax.lax.broadcasted_iota(jnp.int32, (1, BINS), 1).astype(jnp.float32) + 1.0

    for ch in range(_BLOCK_C):
        lo = lo_ref[ch, 0]
        width = hi_ref[ch, 0] - lo
        # bin right-edges, matching jnp.linspace(lo, hi, BINS+1)[1:]
        edges = jnp.where(width > 0, lo + j * (width / float(BINS)),
                          jnp.full((1, BINS), lo))
        # remapped[i] = interp_ref(t_cdf[i]; xp=s_cdf, fp=edges)  (256 queries)
        remapped = _interp_packed(t_cdf[ch], s_cdf[ch:ch + 1], edges)[None, :]
        # matched sample values: interp_ref(x; xp=edges, fp=remapped)
        out_ref[ch, :] = _interp_packed(t_ref[ch, :], edges, remapped)


@partial(jax.jit, static_argnames=("block_n",))
def cdf_remap(t: jnp.ndarray, t_hist: jnp.ndarray, s_hist: jnp.ndarray,
              lo: jnp.ndarray, hi: jnp.ndarray,
              block_n: int = 1024) -> jnp.ndarray:
    """(C, N) target samples -> matched values, given per-channel histograms.

    Channels pad (edge) to a multiple of 8, samples to block_n; padding
    results are sliced away."""
    c, n = t.shape
    cpad = (-c) % _BLOCK_C
    npad = (-n) % block_n
    if cpad or npad:
        t = jnp.pad(t, ((0, cpad), (0, npad)), mode="edge")
        t_hist = jnp.pad(t_hist, ((0, cpad), (0, 0)), mode="edge")
        s_hist = jnp.pad(s_hist, ((0, cpad), (0, 0)), mode="edge")
        lo = jnp.pad(lo, (0, cpad), mode="edge")
        hi = jnp.pad(hi, (0, cpad), mode="edge")

    cp, np_ = t.shape
    grid = (cp // _BLOCK_C, np_ // block_n)
    out = pl.pallas_call(
        _remap_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BLOCK_C, block_n), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_C, BINS), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_C, BINS), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_C, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_C, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK_C, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cp, np_), jnp.float32),
    )(t.astype(jnp.float32), t_hist, s_hist,
      lo[:, None].astype(jnp.float32), hi[:, None].astype(jnp.float32))
    return out[:c, :n]

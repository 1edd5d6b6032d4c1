"""Pallas TPU kernel: batched shared-range 256-bin histograms.

The reference's cdf mode bottoms out in a PYTHON LOOP over channels calling
``torch.histc`` (``/root/reference/histmatch.py:49-58``) — one scatter kernel
launch per channel. The XLA fallback here (``histmatch._histc``) uses
scatter-add, which TPU serializes. This kernel instead computes all channels'
histograms in one launch with a compare-and-accumulate scheme that maps onto
the VPU:

  grid = (C_blocks, N_blocks); each step loads a (BC, BN) tile of samples,
  computes each sample's bin index arithmetically (torch.histc semantics:
  idx = trunc((x - lo) * bins / (hi - lo)), top edge folded into the last
  bin), and accumulates counts into a VMEM (BC, 256) scratch; the last
  N-block flushes to HBM.

Counting scheme (round 5): the 256-wide one-hot FACTORS through 16 x 16
nibble one-hots, exactly like the pwl_remap lookup (its structural twin):
with idx = 16*h + l, count[16h+l] = sum_n E_hi[h, n] * E_lo[n, l] — a
(16, BN) x (BN, 16) matmul on the MXU per channel. Per-sample VPU cost
drops from ~512 ops (256 compares + 256 adds) to ~35 (two 16-wide compares
+ index arithmetic); the contraction rides the MXU. The r4 trace showed
the cdf loop is WORK-bound on the VPU and, post-pwl_remap, the two
histograms per iteration were its dominant term. EXACT: one-hot products
are 0/1 (exact in any dtype), counts are small integers accumulated in
f32 — bit-identical to the compare-sum scheme.

No scatter, no sort; the only per-sample VPU work is nibble one-hot-izing.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BINS = 256
_G = 16  # factored one-hot group size (16 * 16 == BINS)


def _hist_kernel(x_ref, lo_ref, hi_ref, out_ref, acc_ref):
    """x: (BC, BN) tile; lo/hi: (BC, 1); out/acc: (BC, 16, 16) nibble-major
    counts (count of bin 16h+l at [:, h, l] — reshaped to (BC, 256) by the
    caller, outside the kernel: a (16, 16) -> (256,) relayout is exactly the
    kind of sublane/lane shuffle Mosaic lowers slowly)."""
    nb = pl.num_programs(1)
    j = pl.program_id(1)
    block_c, bn = x_ref.shape

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (_G, bn), 0)   # (16, BN)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (bn, _G), 1)   # (BN, 16)
    for ch in range(block_c):
        x = x_ref[ch, :]
        lo = lo_ref[ch, 0]
        hi = hi_ref[ch, 0]
        width = hi - lo
        safe = jnp.where(width > 0, width, 1.0)
        idx = ((x - lo) * float(BINS) / safe).astype(jnp.int32)
        idx = jnp.clip(idx, 0, BINS - 1)  # top edge -> last bin
        ih = idx // _G
        il = idx - ih * _G
        ehi = (iota_hi == ih[None, :]).astype(jnp.float32)       # (16, BN)
        elo = (iota_lo == il[:, None]).astype(jnp.float32)       # (BN, 16)
        # count[16h + l] = sum_n ehi[h, n] * elo[n, l]  (MXU contraction;
        # exact — 0/1 products, integer sums in f32)
        acc_ref[ch] += jnp.dot(ehi, elo, preferred_element_type=jnp.float32)

    @pl.when(j == nb - 1)
    def _():
        out_ref[:] = acc_ref[:]


@partial(jax.jit, static_argnames=("block_c", "block_n"))
def batched_histogram(x: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
                      block_c: int = 8, block_n: int = 512) -> jnp.ndarray:
    """(C, N) samples + per-channel (C,) lo/hi -> (C, BINS) float32 counts.

    N and C are padded to block multiples. Pad COLUMNS are set to each
    channel's own lo, so every channel (real and pad) counts its npad
    synthetic samples into bin 0; the exact surplus (npad) is subtracted from
    every real channel's bin 0 afterwards. Pad ROWS are dropped by the final
    ``out[:c]`` slice.
    """
    c, n = x.shape
    cpad = (-c) % block_c
    npad = (-n) % block_n
    if cpad or npad:
        # pad samples with each channel's own lo -> they land in bin 0; the
        # caller subtracts them (count known = npad) from bin 0.
        x = jnp.pad(x, ((0, cpad), (0, npad)), mode="edge")
        x = x.at[:, n:].set(jnp.pad(lo, (0, cpad), mode="edge")[:, None]) \
            if npad else x
        lo = jnp.pad(lo, (0, cpad), mode="edge")
        hi = jnp.pad(hi, (0, cpad), mode="edge")

    cp, np_ = x.shape
    grid = (cp // block_c, np_ // block_n)

    out = pl.pallas_call(
        _hist_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_c, block_n), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_c, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_c, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_c, _G, _G), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cp, _G, _G), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_c, _G, _G), jnp.float32)],
    )(x, lo[:, None], hi[:, None])

    # nibble-major (C, 16, 16) -> (C, 256): row-major reshape puts bin
    # 16h + l at position 16h + l, matching the arithmetic index
    out = out.reshape(cp, BINS)[:c]
    if npad:
        # remove the synthetic pad-sample counts from bin 0
        out = out.at[:, 0].add(-float(npad))
    return out


def histogram_available() -> bool:
    """True when running on a backend where the Pallas kernel compiles."""
    return jax.default_backend() in ("tpu", "axon")

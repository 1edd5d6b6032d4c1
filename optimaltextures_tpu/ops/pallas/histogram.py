"""Pallas TPU kernel: batched shared-range 256-bin histograms.

The reference's cdf mode bottoms out in a PYTHON LOOP over channels calling
``torch.histc`` (``/root/reference/histmatch.py:49-58``) — one scatter kernel
launch per channel. The XLA fallback here (``histmatch._histc``) uses
scatter-add, which TPU serializes. This kernel instead computes all channels'
histograms in one launch with a compare-and-contract scheme that puts the
counting on the MXU:

  grid = (C_blocks, N_blocks); each step loads a (BC, BN) tile of samples,
  computes each sample's bin index arithmetically (torch.histc semantics:
  idx = trunc((x - lo) * bins / (hi - lo)), top edge folded into the last
  bin), and accumulates counts into a VMEM scratch; the last N-block
  flushes to HBM.

Counting scheme (round 5, v2): the 256-wide one-hot FACTORS through 16 x 16
nibble one-hots (idx = 16*h + l), and ALL block_c=8 channels contract in ONE
full-width MXU dot. Build two (8*16, BN) bf16 one-hot matrices

  EHI[16c + h, n] = (ih[c, n] == h),   ELO[16c + l, n] = (il[c, n] == l)

and take ``big = EHI @ ELO^T`` ((128, BN) x (128, BN) NT-contraction ->
(128, 128), f32 accumulate). Entry [16c+h, 16c'+l] counts samples where
channel c's high nibble is h AND channel c''s low nibble is l — the 8
DIAGONAL 16 x 16 blocks (c == c') are exactly the per-channel histograms;
off-diagonal cross-channel blocks are discarded at flush time.

Why this shape: the r5 trace showed the previous per-channel
(16, BN) x (BN, 16) f32 dots at ~1/64 MXU utilization were cdf mode's
single largest device cost (0.57 s of a 0.72 s program). One 128-row
NT dot per tile runs all 8 channels in the same K-pass (8x fewer MXU
cycles) and bf16 operands take the native MXU rate that f32 inputs
forfeit. EXACT: one-hot entries are 0/1 (exact in bf16), products are
0/1, and counts are small integers (< 2^24) accumulated in f32 —
bit-identical to the compare-sum scheme and to torch.histc.

No scatter, no sort; the only per-sample VPU work is nibble one-hot-izing
(two 16-wide compares + index arithmetic, ~35 ops).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BINS = 256
_G = 16        # factored one-hot group size (16 * 16 == BINS)
_BLOCK_C = 8   # channels per grid row; 8 * 16 == 128 rows == full MXU


def _hist_kernel(x_ref, lo_ref, hi_ref, out_ref, acc_ref):
    """x: (8, BN) tile; lo/hi: (8, 1); acc: (128, 128) f32 scratch; out:
    (8, 16, 16) nibble-major counts (count of bin 16h+l at [:, h, l] —
    reshaped to (8, 256) by the caller, outside the kernel: a (16, 16) ->
    (256,) relayout is exactly the kind of sublane/lane shuffle Mosaic
    lowers slowly)."""
    nb = pl.num_programs(1)
    j = pl.program_id(1)
    block_c, bn = x_ref.shape

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    lo = lo_ref[:]
    hi = hi_ref[:]
    width = hi - lo
    safe = jnp.where(width > 0, width, 1.0)
    idx = ((x - lo) * float(BINS) / safe).astype(jnp.int32)
    idx = jnp.clip(idx, 0, BINS - 1)          # top edge -> last bin
    ih = idx // _G
    il = idx - ih * _G                         # (8, BN)
    iota = jax.lax.broadcasted_iota(jnp.int32, (block_c, _G, bn), 1)
    ehi = (iota == ih[:, None, :]).astype(jnp.bfloat16)
    elo = (iota == il[:, None, :]).astype(jnp.bfloat16)
    ehi = ehi.reshape(block_c * _G, bn)        # sublane-merge: layout-free
    elo = elo.reshape(block_c * _G, bn)
    # (128, BN) x (128, BN) NT-contraction over the tile's samples: one
    # full-MXU K-pass counts all 8 channels at once (0/1 bf16 products,
    # exact integer sums in f32).
    big = jax.lax.dot_general(ehi, elo, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    acc_ref[:] += big

    @pl.when(j == nb - 1)
    def _():
        for ch in range(block_c):
            out_ref[ch] = acc_ref[ch * _G:(ch + 1) * _G,
                                  ch * _G:(ch + 1) * _G]


@partial(jax.jit, static_argnames=("block_n",))
def batched_histogram(x: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
                      block_n: int = 1024) -> jnp.ndarray:
    """(C, N) samples + per-channel (C,) lo/hi -> (C, BINS) float32 counts.

    N and C are padded to block multiples. Pad COLUMNS are set to each
    channel's own lo, so every channel (real and pad) counts its npad
    synthetic samples into bin 0; the exact surplus (npad) is subtracted from
    every real channel's bin 0 afterwards. Pad ROWS are dropped by the final
    ``out[:c]`` slice.
    """
    c, n = x.shape
    cpad = (-c) % _BLOCK_C
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
    grid = (cp // _BLOCK_C, np_ // block_n)

    out = pl.pallas_call(
        _hist_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BLOCK_C, block_n), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_C, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_C, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK_C, _G, _G), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cp, _G, _G), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_BLOCK_C * _G, _BLOCK_C * _G),
                                   jnp.float32)],
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

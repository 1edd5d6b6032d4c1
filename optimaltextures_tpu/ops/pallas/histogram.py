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
  bin), one-hot-izes against the 256 bin ids broadcast across lanes, and
  accumulates into a VMEM (BC, 256) scratch; the last N-block flushes to HBM.

No scatter, no sort, fully vectorized; ~BN*256 VPU ops per tile.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BINS = 256


def _hist_kernel(x_ref, lo_ref, hi_ref, out_ref, acc_ref):
    """x: (BC, BN) tile; lo/hi: (BC, 1); out/acc: (BC, BINS)."""
    nb = pl.num_programs(1)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    lo = lo_ref[:]  # (BC, 1)
    hi = hi_ref[:]
    width = hi - lo
    safe = jnp.where(width > 0, width, 1.0)
    idx = ((x - lo) * float(BINS) / safe).astype(jnp.int32)
    idx = jnp.clip(idx, 0, BINS - 1)  # top edge -> last bin

    # one-hot accumulate: compare (BC, BN, 1) indices to (1, 1, BINS) ids;
    # the bool intermediate stays (BC, BN, BINS) i1 in VMEM — BN is sized so
    # this fits comfortably
    bin_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, BINS), 2)
    onehot = idx[:, :, None] == bin_ids
    acc_ref[:] += jnp.sum(onehot, axis=1, dtype=jnp.float32)

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
        out_specs=pl.BlockSpec((block_c, BINS), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cp, BINS), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_c, BINS), jnp.float32)],
    )(x, lo[:, None], hi[:, None])

    out = out[:c]
    if npad:
        # remove the synthetic pad-sample counts from bin 0
        out = out.at[:, 0].add(-float(npad))
    return out


def histogram_available() -> bool:
    """True when running on a backend where the Pallas kernel compiles."""
    return jax.default_backend() in ("tpu", "axon")

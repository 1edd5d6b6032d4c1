"""Prototype: Pallas 3x3 conv, Cin=Cout=64, 2-pixel MXU packing.

The d5 batch-128 trace shows XLA's 64-channel convs at ~63-70 TF/s: with the
batch-minor layout the conv is an (M=Cout, K=9*Cin, N=batch) contraction and
M=64 fills half the MXU's 128 rows. Packing stride-2 pixel pairs into Cout
at the XLA level was a wash (the 4/3 padding-FLOP tax cancels the MXU gain,
tools/convpack_bench.py). This kernel does the packing WITHOUT the tax:

  out[(s*64+co), b] at pair (h, 2p) = sum_r dot(Wrow[r], patch_r)
  Wrow[r] : (128, 256) = both phases' weights over the 4-col window
  patch_r : (256, 128) = x[h+r-1, 2p-1 : 2p+3, :, :] as (4*64, batch)

M=128, K=256 x 3, N=128 — full MXU tiles; useful/performed = 75%
(theoretical 148 TF/s on a 197 TF/s chip).

Data layout: x as (H+2, W+2, C=64, B=128) — C in sublanes, batch in lanes
(pre-padded and pre-transposed by the caller for this prototype; production
integration pays one transpose per codec-region boundary). Manual
double-buffered DMA over a flat (nH * nW) grid; Pallas pipelines the output
blocks itself.

Measures TF/s vs the XLA in-context chain number (~63.6 TF/s) and checks
exactness against lax.conv on the same padded input.

    python tools/pallas_conv_proto.py [--size 512] [--batch 128] [--n 20]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/optex_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pack_wrow(w):
    """(3,3,64,64) HWIO -> (3, 128, 256): Wrow[r, 64s+co, 64c+ci] =
    w[r, c-s, ci, co] for phases s in {0,1}, window cols c in 0..3."""
    kh, kw, cin, cout = w.shape
    wr = np.zeros((kh, 2 * cout, 4 * cin), np.float32)
    wnp = np.asarray(w, np.float32)
    for s in (0, 1):
        for c in range(4):
            if 0 <= c - s <= 2:
                # (ci, co) -> rows 64s+co, cols 64c+ci
                wr[:, s * cout:(s + 1) * cout, c * cin:(c + 1) * cin] = \
                    np.transpose(wnp[:, c - s], (0, 2, 1))
    return jnp.asarray(wr, w.dtype)


def _kernel(x_hbm, w_ref, o_ref, xbuf, sem, *, th, tw, n_w, unroll):
    t = pl.program_id(0)
    n_t = pl.num_programs(0)

    def tile_dma(tt, slot):
        i, j = tt // n_w, tt % n_w
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * th, th + 2), pl.ds(j * tw, tw + 2)],
            xbuf.at[slot], sem.at[slot])

    @pl.when(t == 0)
    def _():
        tile_dma(0, 0).start()

    @pl.when(t + 1 < n_t)
    def _():
        tile_dma(t + 1, (t + 1) % 2).start()

    tile_dma(t, t % 2).wait()
    buf = xbuf.at[t % 2]

    w0 = w_ref[0]
    w1 = w_ref[1]
    w2 = w_ref[2]

    def do_pair(h, p):
        patch0 = buf[h + 0, pl.ds(2 * p, 4)].reshape(256, 128)
        patch1 = buf[h + 1, pl.ds(2 * p, 4)].reshape(256, 128)
        patch2 = buf[h + 2, pl.ds(2 * p, 4)].reshape(256, 128)
        acc = jnp.dot(w0, patch0, preferred_element_type=jnp.float32)
        acc += jnp.dot(w1, patch1, preferred_element_type=jnp.float32)
        acc += jnp.dot(w2, patch2, preferred_element_type=jnp.float32)
        y = jnp.maximum(acc, 0.0).astype(o_ref.dtype)
        o_ref[h, pl.ds(2 * p, 2)] = y.reshape(2, 64, 128)

    if unroll:
        for h in range(th):
            for p in range(tw // 2):
                do_pair(h, p)
    else:
        for h in range(th):
            jax.lax.fori_loop(
                0, tw // 2, lambda p, _: (do_pair(h, p), 0)[1], 0)


@functools.partial(jax.jit, static_argnames=("th", "tw", "unroll"))
def conv64_pallas(xpad, wrow, th=8, tw=16, unroll=False):
    """xpad: (H+2, W+2, 64, 128) bf16; wrow: (3, 128, 256); returns
    relu(conv) as (H, W, 64, 128)."""
    hp, wp, c, b = xpad.shape
    h, w = hp - 2, wp - 2
    n_h, n_w = h // th, w // tw
    kern = functools.partial(_kernel, th=th, tw=tw, n_w=n_w, unroll=unroll)
    return pl.pallas_call(
        kern,
        grid=(n_h * n_w,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),           # x stays in HBM
            pl.BlockSpec((3, 128, 256), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (th, tw, c, b), lambda t: (t // n_w, t % n_w, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, c, b), xpad.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, tw + 2, c, b), xpad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(xpad, wrow)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--th", type=int, default=8)
    ap.add_argument("--tw", type=int, default=16)
    ap.add_argument("--check_only", action="store_true")
    ap.add_argument("--unroll", action="store_true")
    args = ap.parse_args()
    S, B = args.size, args.batch
    key = jax.random.key(0)
    dt = jnp.bfloat16

    w = (jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 64, 64),
                           jnp.float32) * 0.1).astype(dt)
    wrow = pack_wrow(w)

    # correctness at small scale first
    xs = jax.random.normal(key, (64 + 2, 64 + 2, 64, 128), dt)
    ref = jax.nn.relu(lax.conv_general_dilated(
        jnp.transpose(xs, (3, 0, 1, 2)), w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    got = jnp.transpose(conv64_pallas(xs, wrow, args.th, args.tw, args.unroll),
                        (3, 0, 1, 2))
    err = float(jnp.max(jnp.abs((ref - got).astype(jnp.float32))))
    rel = err / float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    print(f"correctness 64px: max abs err {err:.3e} (rel {rel:.2e})",
          flush=True)
    if args.check_only:
        return

    xpad = jax.random.normal(key, (S + 2, S + 2, 64, B), dt)
    f = lambda x: conv64_pallas(x, wrow, args.th, args.tw, args.unroll)
    y = f(xpad)
    jax.block_until_ready(y)
    t0 = time.time()
    for _ in range(args.n):
        y = f(xpad)
    jax.block_until_ready(y)
    sec = (time.time() - t0) / args.n
    fl = 2 * 9 * 64 * 64 * S * S * B
    print(f"pallas conv64: {sec*1e3:.2f} ms  {fl/sec/1e12:.1f} TF/s "
          f"(XLA in-context baseline ~38.9 ms / 63.6 TF/s)", flush=True)


if __name__ == "__main__":
    main()

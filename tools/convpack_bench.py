"""Microbenchmark: MXU-packing variants for the codec's underfilled convs.

The d5 batch-128 trace (docs/PERF.md r5) shows Cout=64 convs running at
~63 TF/s (half-MXU: M=64 of 128 output rows) and the 64->3 decoder-final
convs at ~6 TF/s. These are 48% of conv time. This script measures, on the
attached TPU at the exact point-of-record shapes, whether re-expressing
them as strided pixel-packed convs (two adjacent output pixels ride as one
128-wide channel block; the un-packing reshape is free in both C-minor and
batch-minor layouts) buys the predicted ~1.6x.

Variants (all bf16, batch 128, 512px-scale shapes):
  conv64    : reflect_pad + VALID (3,3,64,64)           [baseline]
  conv64_p2 : reflect_pad + (3,4,64,128) stride (1,2) + free reshape
  conv128to64 / _p2 : the decoder (128,64) conv at 256^2
  conv3to64 / _p2   : the encoder entry conv (K=27)
  upconv    : nearest_up + reflect_pad + (3,3,64,64)    [baseline]
  upconv_fold: two (2,3,64,128) phase convs on the LOW-res tensor
               (edge padding) + row-interleave stack — no 4x buffer
  final64to3 : reflect_pad + (3,3,64,3)                 [baseline]
  final_p16 / _p32 : (3,18,64,48) stride 16 / (3,34,64,96) stride 32

Each variant is checked numerically against its baseline (max abs err) and
timed as a back-to-back dispatch chain with one final sync (per-op device
time >= 5 ms, so tunnel dispatch noise is amortized).

Run with the axon tunnel env (ONE TPU process at a time):
    python tools/convpack_bench.py [--batch 128] [--size 512] [--n 20]
"""

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/optex_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

DN = ("NHWC", "HWIO", "NHWC")


def reflect_pad(x, p=1):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


def conv(x, w, strides=(1, 1)):
    return lax.conv_general_dilated(x, w, window_strides=strides,
                                    padding="VALID", dimension_numbers=DN)


def pack_w2(w):
    """(3,3,Cin,Cout) -> (3,4,Cin,2*Cout): two adjacent output pixels as
    one channel block. w2[r, c, :, s*Cout+co] = w[r, c-s, :, co]."""
    kh, kw, cin, cout = w.shape
    w2 = jnp.zeros((kh, kw + 1, cin, 2 * cout), w.dtype)
    w2 = w2.at[:, 0:kw, :, :cout].set(w)
    w2 = w2.at[:, 1:kw + 1, :, cout:].set(w)
    return w2


def pack_wN(w, n):
    """(3,3,Cin,Cout) -> (3, 2+n, Cin, n*Cout) for stride-n packing."""
    kh, kw, cin, cout = w.shape
    wn = jnp.zeros((kh, kw - 1 + n, cin, n * cout), w.dtype)
    for s in range(n):
        wn = wn.at[:, s:s + kw, :, s * cout:(s + 1) * cout].set(w)
    return wn


def packed_conv(xp, wn, n):
    """VALID strided conv on the reflect-padded input + free un-pack."""
    y = conv(xp, wn, strides=(1, n))
    b, h, wq, c = y.shape
    return y.reshape(b, h, wq * n, c // n)


def upconv_ref(x, w):
    n, h, wdt, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, wdt, 2, c))
    y = y.reshape(n, 2 * h, 2 * wdt, c)
    return conv(reflect_pad(y), w)


def fold_up_weights(w):
    """(3,3,C,Co) -> wa0, wa1 each (2,3,C,2*Co) for the two row phases.

    Row phase a=0 output row 2i combines coarse rows (i-1, i) with row
    weights (W0, W1+W2); a=1 row 2i+1 combines (i, i+1) with (W0+W1, W2).
    Col phase b rides in the channel dim: b=0 cols (j-1, j) weights
    (V0, V1+V2), b=1 cols (j, j+1) weights (V0+V1, V2) -- both phases
    share the 3-wide col window (j-1, j, j+1), so the kernel is (2, 3).
    """
    co = w.shape[-1]

    def row_fold(a):
        if a == 0:
            return jnp.stack([w[0], w[1] + w[2]], axis=0)      # (2,3,C,Co)
        return jnp.stack([w[0] + w[1], w[2]], axis=0)

    def col_fold(rw):  # rw (2,3,C,Co) -> (2,3,C,2Co) col-phase packing
        out = jnp.zeros((2, 3, rw.shape[2], 2 * co), rw.dtype)
        # b=0: cols (j-1, j) -> kernel cols (0, 1) with (V0, V1+V2)
        out = out.at[:, 0, :, :co].set(rw[:, 0])
        out = out.at[:, 1, :, :co].set(rw[:, 1] + rw[:, 2])
        # b=1: cols (j, j+1) -> kernel cols (1, 2) with (V0+V1, V2)
        out = out.at[:, 1, :, co:].set(rw[:, 0] + rw[:, 1])
        out = out.at[:, 2, :, co:].set(rw[:, 2])
        return out

    return col_fold(row_fold(0)), col_fold(row_fold(1))


def upconv_fold(x, wa0, wa1):
    """nearest_up2x + reflect_pad + conv3x3  ==  two phase convs on the
    LOW-res tensor with EDGE padding (fine-scale reflection of a nearest-
    upsampled image is coarse-scale replication), row-interleaved."""
    co = wa0.shape[-1] // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    n, hp, wp, _ = xp.shape
    h, wdt = hp - 2, wp - 2
    # a=0 needs coarse rows (i-1, i): rows [0, h) of xp; a=1 rows (i, i+1)
    ya0 = conv(xp[:, 0:h + 1], wa0)           # (n, h, w, 2co)
    ya1 = conv(xp[:, 1:h + 2], wa1)
    ya0 = ya0.reshape(n, h, 2 * wdt, co)      # free col-phase un-pack
    ya1 = ya1.reshape(n, h, 2 * wdt, co)
    y = jnp.stack([ya0, ya1], axis=2)         # (n, h, 2, 2w, co)
    return y.reshape(n, 2 * h, 2 * wdt, co)


def timed_chain(fn, x, n, donate=False):
    """Dispatch fn n times back-to-back, one final sync; secs/op."""
    f = jax.jit(fn, donate_argnums=(0,) if donate else ())
    y = f(x)
    if donate:
        del x  # donated: free HBM before the chain
    jax.block_until_ready(y)
    if donate:
        # chain: y -> f(y); shapes must match
        y = f(y)
        jax.block_until_ready(y)
        t0 = time.time()
        for _ in range(n):
            y = f(y)
        jax.block_until_ready(y)
        return (time.time() - t0) / n
    t0 = time.time()
    outs = None
    for _ in range(n):
        outs = f(x)
    jax.block_until_ready(outs)
    return (time.time() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    B, S = args.batch, args.size
    key = jax.random.key(0)
    dt = jnp.bfloat16
    res = {}

    def errcheck(fa, fb, x):
        # jitted, small-batch: eager full-batch intermediates OOM the chip
        d = jax.jit(lambda x: jnp.max(jnp.abs((fa(x) - fb(x))
                                              .astype(jnp.float32))))
        return float(d(x[:4]))

    def report(name, sec, flops, base=None):
        tfs = flops / sec / 1e12
        line = f"{name:18s} {sec*1e3:8.2f} ms  {tfs:7.1f} TF/s"
        if base is not None:
            line += f"  ({res[base]['ms']/ (sec*1e3):.2f}x vs {base})"
        print(line, flush=True)
        res[name] = {"ms": sec * 1e3, "tflops_per_sec": tfs}

    def mk(shape, k=0):
        return jax.random.normal(jax.random.fold_in(key, 100 + k), shape, dt)

    UNROLL = 10

    def chain(step):
        # 10 convs inside ONE jit: XLA picks production (batch-minor)
        # layouts internally; the entry/exit relayouts amortize. Matches
        # how these convs run inside the fused stage programs.
        def fn(x):
            for _ in range(UNROLL):
                x = jax.nn.relu(step(x))
            return x
        return fn

    def maxpool(x):
        return lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID")

    # ---- 64->64 at S^2 (chain of 10) ----
    w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 64, 64),
                          jnp.float32).astype(dt) * 0.1
    w2 = pack_w2(w)
    f_base = lambda x: conv(reflect_pad(x), w)
    f_p2 = lambda x: packed_conv(reflect_pad(x), w2, 2)
    err = errcheck(f_base, f_p2, mk((4, S, S, 64)))
    print(f"conv64_p2 max abs err {err:.2e}", flush=True)
    fl = 2 * 9 * 64 * 64 * S * S * B * UNROLL
    report("conv64", timed_chain(chain(f_base), mk((B, S, S, 64)), args.n,
                                 donate=True), fl)
    report("conv64_p2", timed_chain(chain(f_p2), mk((B, S, S, 64)), args.n,
                                    donate=True), fl, "conv64")

    # ---- 128->64 at (S/2)^2: pair with a 64->128 to make it cyclic ----
    wd = jax.random.normal(jax.random.fold_in(key, 2), (3, 3, 128, 64),
                           jnp.float32).astype(dt) * 0.1
    wu = jax.random.normal(jax.random.fold_in(key, 5), (3, 3, 64, 128),
                           jnp.float32).astype(dt) * 0.1
    wd2 = pack_w2(wd)
    g_base = lambda x: conv(reflect_pad(x), wd)
    g_p2 = lambda x: packed_conv(reflect_pad(x), wd2, 2)
    err = errcheck(g_base, g_p2, mk((4, S // 2, S // 2, 128)))
    print(f"conv128to64_p2 max abs err {err:.2e}", flush=True)
    # per-iter flops: the 128->64 under test + the fixed 64->128 return conv
    fl = 2 * 9 * 128 * 64 * (S // 2) ** 2 * B * UNROLL * 2
    back = lambda y: conv(reflect_pad(y), wu)
    report("conv128to64_pair",
           timed_chain(chain(lambda x: back(g_base(x))),
                       mk((B, S // 2, S // 2, 128), 1), args.n, donate=True),
           fl)
    report("conv128to64_p2_pair",
           timed_chain(chain(lambda x: back(g_p2(x))),
                       mk((B, S // 2, S // 2, 128), 1), args.n, donate=True),
           fl, "conv128to64_pair")

    # ---- encoder entry (3->64) + decoder exit (64->3) as one cycle ----
    we = jax.random.normal(jax.random.fold_in(key, 3), (3, 3, 3, 64),
                           jnp.float32).astype(dt) * 0.1
    wf = jax.random.normal(jax.random.fold_in(key, 4), (3, 3, 64, 3),
                           jnp.float32).astype(dt) * 0.1
    we2 = pack_w2(we)
    h_base = lambda x: conv(reflect_pad(x), we)
    h_p2 = lambda x: packed_conv(reflect_pad(x), we2, 2)
    t_base = lambda y: conv(reflect_pad(y), wf)
    err = errcheck(h_base, h_p2, mk((4, S, S, 3)))
    print(f"conv3to64_p2 max abs err {err:.2e}", flush=True)
    fl = (2 * 9 * 3 * 64 + 2 * 9 * 64 * 3) * S * S * B * UNROLL
    report("entry_exit", timed_chain(chain(lambda x: t_base(h_base(x))),
                                     mk((B, S, S, 3), 2), args.n,
                                     donate=True), fl)
    for n_pack in (8, 16, 32):
        wfn = pack_wN(wf, n_pack)
        t_p = lambda y, wfn=wfn, n_pack=n_pack: packed_conv(
            reflect_pad(y), wfn, n_pack)
        err = errcheck(t_base, t_p, mk((4, S, S, 64)))
        print(f"final_p{n_pack} max abs err {err:.2e}", flush=True)
        report(f"entry_exit_p{n_pack}",
               timed_chain(chain(lambda x, t_p=t_p: t_p(h_p2(x))),
                           mk((B, S, S, 3), 2), args.n, donate=True),
               fl, "entry_exit")

    # ---- upconv: nearest x2 + 64->64, cycled through a maxpool ----
    wa0, wa1 = fold_up_weights(w)
    u_base = lambda x: upconv_ref(x, w)
    u_fold = lambda x: upconv_fold(x, wa0, wa1)
    err = errcheck(u_base, u_fold, mk((4, S // 2, S // 2, 64)))
    print(f"upconv_fold max abs err {err:.2e}", flush=True)
    fl = 2 * 9 * 64 * 64 * S * S * B * UNROLL  # fine-scale conv flops
    report("upconv_pool", timed_chain(chain(lambda x: maxpool(u_base(x))),
                                      mk((B, S // 2, S // 2, 64), 3),
                                      args.n, donate=True), fl)
    report("upconv_fold_pool",
           timed_chain(chain(lambda x: maxpool(u_fold(x))),
                       mk((B, S // 2, S // 2, 64), 3), args.n, donate=True),
           fl, "upconv_pool")

    print(json.dumps(res))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()

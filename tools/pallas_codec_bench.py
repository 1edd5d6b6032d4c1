"""On-chip rate check of the ops/pallas/codec.py kernels vs their XLA twins.

Chains (each 10 ops inside one jit, one sync; 512px-scale, batch 128, bf16):
  A: conv3x3_p2 (cycles on itself)        vs XLA pad+conv+relu
  B: upconv_p2 -> conv3x3_p2(pool)        vs XLA up+conv / conv+pool
  C: final_to_rgb -> rgb_to_relu1         vs XLA final+renorm / entry convs

    python tools/pallas_codec_bench.py [--size 512] [--n 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/optex_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from optimaltextures_tpu.ops.pallas import codec
from optimaltextures_tpu.ops.convops import (reflect_pad, conv2d_nhwc,
                                             maxpool_2x2_ceil,
                                             upsample_nearest_2x)

UNROLL = 10


def timed(fn, x, n):
    f = jax.jit(fn, donate_argnums=(0,))
    y = f(x)
    del x
    jax.block_until_ready(y)
    y = f(y)
    jax.block_until_ready(y)
    t0 = time.time()
    for _ in range(n):
        y = f(y)
    jax.block_until_ready(y)
    return (time.time() - t0) / n / UNROLL


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--n", type=int, default=20)
    args = ap.parse_args()
    S, B = args.size, 128
    key = jax.random.key(0)
    dt = jnp.bfloat16
    res = {}

    w = (jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 64, 64),
                           jnp.float32) * 0.1).astype(dt)
    b = (jax.random.normal(jax.random.fold_in(key, 2), (64,),
                           jnp.float32) * 0.1).astype(dt)
    wf = (jax.random.normal(jax.random.fold_in(key, 3), (3, 3, 64, 3),
                            jnp.float32) * 0.1).astype(dt)
    bf = jnp.zeros((3,), dt)
    wrn = (jnp.eye(3).reshape(1, 1, 3, 3) * 0.8).astype(dt)
    brn = jnp.zeros((3,), dt)
    we_ = (jax.random.normal(jax.random.fold_in(key, 4), (3, 3, 3, 64),
                             jnp.float32) * 0.1).astype(dt)
    be_ = (jax.random.normal(jax.random.fold_in(key, 5), (64,),
                             jnp.float32) * 0.1).astype(dt)

    wr, b2 = codec.pack_conv_p2(w, b)
    wa0, wa1, bu = codec.pack_upconv_fold(w, b)
    w3, b3 = codec.pack_final_rgb(wf, bf, wrn, brn)
    we, be = codec.pack_entry_rgb(we_, be_)

    # ---- on-chip correctness (compiled kernels, 64px) ----
    xs = jax.random.normal(key, (B, 64, 64, 64), dt)
    ref = jax.jit(lambda x: jax.nn.relu(conv2d_nhwc(reflect_pad(x), w, b)))(xs)
    got = jax.jit(lambda x: codec.tcb_to_nhwc(
        codec.conv3x3_p2(codec.nhwc_to_tcb(x), wr, b2)))(xs)
    err = float(jnp.max(jnp.abs((ref - got).astype(jnp.float32))))
    print(f"compiled K1 64px err {err:.2e}", flush=True)

    fl1 = 2 * 9 * 64 * 64 * S * S * B * UNROLL

    # chain A
    def chainA_p(x):
        for _ in range(UNROLL):
            x = codec.conv3x3_p2(x, wr, b2)
        return x

    def chainA_x(x):
        for _ in range(UNROLL):
            x = jax.nn.relu(conv2d_nhwc(reflect_pad(x), w, b))
        return x

    x_tcb = jax.random.normal(key, (S, S, 64, B), dt)
    sec = timed(chainA_p, x_tcb, args.n)
    res["K1_pallas"] = sec * 1e3
    print(f"K1 pallas {sec*1e3:8.2f} ms  {fl1/UNROLL/sec/1e12:6.1f} TF/s",
          flush=True)
    x_n = jax.random.normal(key, (B, S, S, 64), dt)
    sec = timed(chainA_x, x_n, args.n)
    res["K1_xla"] = sec * 1e3
    print(f"K1 xla    {sec*1e3:8.2f} ms  {fl1/UNROLL/sec/1e12:6.1f} TF/s",
          flush=True)

    # chain B: coarse -> up -> fine conv+pool -> coarse
    def chainB_p(x):
        for _ in range(UNROLL):
            x = codec.upconv_p2(x, wa0, wa1, bu)
            x = codec.conv3x3_p2(x, wr, b2, pool=True)
        return x

    def chainB_x(x):
        for _ in range(UNROLL):
            x = jax.nn.relu(conv2d_nhwc(reflect_pad(
                upsample_nearest_2x(x)), w, b))
            x = maxpool_2x2_ceil(jax.nn.relu(conv2d_nhwc(reflect_pad(x),
                                                         w, b)))
        return x

    xc = jax.random.normal(key, (S // 2, S // 2, 64, B), dt)
    sec = timed(chainB_p, xc, args.n)
    res["B_pallas"] = sec * 1e3
    print(f"B  pallas {sec*1e3:8.2f} ms/iter (up+conv+pool)", flush=True)
    xcn = jax.random.normal(key, (B, S // 2, S // 2, 64), dt)
    sec = timed(chainB_x, xcn, args.n)
    res["B_xla"] = sec * 1e3
    print(f"B  xla    {sec*1e3:8.2f} ms/iter", flush=True)

    # chain C: features -> rgb -> features
    def chainC_p(x):
        for _ in range(UNROLL):
            rgb = codec.final_to_rgb(x, w3, b3)
            x = codec.rgb_to_relu1(rgb, we, be, out_dtype=dt)
        return x

    def chainC_x(x):
        for _ in range(UNROLL):
            rgb = conv2d_nhwc(conv2d_nhwc(reflect_pad(x), wf, bf), wrn, brn)
            x = jax.nn.relu(conv2d_nhwc(reflect_pad(rgb), we_, be_))
        return x

    sec = timed(chainC_p, jax.random.normal(key, (S, S, 64, B), dt), args.n)
    res["C_pallas"] = sec * 1e3
    print(f"C  pallas {sec*1e3:8.2f} ms/iter (final+renorm+entry)",
          flush=True)
    sec = timed(chainC_x, jax.random.normal(key, (B, S, S, 64), dt), args.n)
    res["C_xla"] = sec * 1e3
    print(f"C  xla    {sec*1e3:8.2f} ms/iter", flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()

"""Single-chip throughput saturation sweep (VERDICT r3 next-step #2).

Sweeps the batch axis (N noise pastiches per run — the reference's --batch,
optex.py:225/263) at a fixed size and reports images/sec + sustained
analytic TFLOP/s per point, to locate the one-chip throughput plateau and
its binding resource. Optionally captures a jax.profiler trace at the best
batch (--trace DIR) so the plateau claim can be read off device counters
instead of asserted.

    python tools/batch_sweep.py [--size 512] [--batches 1,2,4,8,16,32]
        [--depth5] [--runs 4] [--trace /tmp/sweep_trace] [--json PATH]

Writes one JSON object per config to stdout (and --json): per batch
{wall_s, img_per_sec, tflops_per_sec, mfu_pct}. OOM at a batch point is
recorded as {"oom": true} and the sweep continues.
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

from optimaltextures_tpu import core
from optimaltextures_tpu.config import OptexConfig
from optimaltextures_tpu.models.vgg import synthetic_bank
from optimaltextures_tpu.utils import flops, imageio

V5E_BF16_PEAK_TFLOPS = 197.0


def sweep(size, batches, depth, runs, conv_dtype="bfloat16", trace_dir=None,
          batch_chunk=0, hist_mode="chol"):
    style_path = "/root/reference/style/graffiti.jpg"
    styles = imageio.load_styles([style_path], size, 1.0)
    cfg = OptexConfig(size=size, style=[style_path], seed=0,
                      hist_mode=hist_mode,
                      conv_dtype=conv_dtype, batch_chunk=batch_chunk,
                      # cfg.batch only gates validation here (run() chunks by
                      # the actual noise batch); keep it chunk-divisible
                      batch=max(batch_chunk, 1),
                      depth=None if depth == 3 else depth)
    bank = synthetic_bank(depth, dtype=jnp.dtype(conv_dtype)) \
        if depth > 3 else None
    synth = core.Synthesizer(cfg, bank=bank) if bank is not None \
        else core.Synthesizer(cfg)

    results = {}
    best_rate, best_batch = 0.0, None
    noise = out = None
    for nb in batches:
        # drop the previous point's buffers BEFORE allocating the next
        # batch — a capacity sweep near the HBM wall OOMs on leftovers
        # otherwise (the allocation itself goes inside the try for the
        # same reason)
        noise = out = None
        try:
            noise = jax.random.uniform(jax.random.key(nb),
                                       (nb, size, size, 3),
                                       dtype=jnp.float32)
            synth.run(noise, styles).block_until_ready()   # compile
            synth.run(noise, styles).block_until_ready()   # settle
            walls = []
            for _ in range(runs):
                t0 = time.time()
                out = synth.run(noise, styles)
                np.asarray(out[0, 0, 0, :1])               # hard sync
                walls.append(time.time() - t0)
            wall = min(walls)
        except Exception as e:  # XlaRuntimeError OOM etc.
            msg = str(e)
            oom = "RESOURCE_EXHAUSTED" in msg or "memory" in msg.lower()
            results[str(nb)] = {"oom": True} if oom \
                else {"error": msg[:200]}
            print(f"batch {nb}: {'OOM' if oom else 'ERROR'} {msg[:120]}",
                  flush=True)
            if not oom:
                raise
            continue
        total = flops.run_flops(synth, (size, size),
                                [s.shape[1:3] for s in styles],
                                synth.last_run_ks) * nb
        rate = nb / wall
        tps = total / wall / 1e12
        results[str(nb)] = {
            "wall_s": round(wall, 4),
            "img_per_sec": round(rate, 2),
            "tflops_per_sec": round(tps, 2),
            "mfu_pct": round(100.0 * tps / V5E_BF16_PEAK_TFLOPS, 2),
        }
        print(f"batch {nb:3d}: {wall:7.3f}s  {rate:7.2f} img/s  "
              f"{tps:6.2f} TF/s  {results[str(nb)]['mfu_pct']:5.2f}% MFU",
              flush=True)
        if rate > best_rate:
            best_rate, best_batch = rate, nb

    if trace_dir and best_batch is not None:
        noise = jax.random.uniform(jax.random.key(best_batch),
                                   (best_batch, size, size, 3),
                                   dtype=jnp.float32)
        synth.run(noise, styles).block_until_ready()
        with jax.profiler.trace(trace_dir):
            out = synth.run(noise, styles)
            np.asarray(out[0, 0, 0, :1])
        print(f"trace of batch {best_batch} written to {trace_dir}",
              flush=True)
    results["best"] = {"batch": best_batch,
                       "img_per_sec": round(best_rate, 2)}
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batches", default="1,2,4,8,16,32")
    ap.add_argument("--depth5", action="store_true",
                    help="also sweep the depth-5 synthetic bank")
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--trace", default=None)
    ap.add_argument("--json", default=None)
    ap.add_argument("--batch_chunk", type=int, default=0,
                    help="micro-batch the codec (images per chunk; caps "
                         "peak HBM so batches past the capacity wall fit)")
    ap.add_argument("--hist_mode", default="chol",
                    help="sweep a non-default OT mode (cdf/sort iterate "
                         "the sample cloud per rotation — no composed "
                         "map; their batch curve answers what those "
                         "modes cost at throughput)")
    ap.add_argument("--skip_depth3", action="store_true")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    out = {}
    if not args.skip_depth3:
        print("== depth 3 (real weights) ==", flush=True)
        out["depth3"] = sweep(args.size, batches, 3, args.runs,
                              trace_dir=args.trace,
                              batch_chunk=args.batch_chunk,
                              hist_mode=args.hist_mode)
    if args.depth5:
        print("== depth 5 (synthetic bank) ==", flush=True)
        out["depth5"] = sweep(args.size, batches, 5, args.runs,
                              trace_dir=(args.trace + "_d5") if args.trace
                              else None,
                              batch_chunk=args.batch_chunk,
                              hist_mode=args.hist_mode)
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()

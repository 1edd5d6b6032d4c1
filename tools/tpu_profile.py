"""Stage-level timing breakdown on the attached accelerator.

Times the full 512px default run vs an iters~0 run (isolating conv codec +
prep overhead from OT iteration cost), and micro-times one OT iteration at
each depth's final-pass scale.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/optex_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from optimaltextures_tpu import core, transport
from optimaltextures_tpu.config import OptexConfig
from optimaltextures_tpu.ops.rotation import random_rotation
from optimaltextures_tpu.utils import imageio


def timed(fn, *args, n=5, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main() -> None:
    size = int(os.environ.get("PROF_SIZE", "512"))
    style_path = "/root/reference/style/graffiti.jpg"
    styles = imageio.load_styles([style_path], size, 1.0)

    for iters in (15, 500):
        cfg = OptexConfig(size=size, iters=iters, style=[style_path], seed=0)
        synth = core.Synthesizer(cfg)
        noise = jax.random.uniform(jax.random.key(0), (1, size, size, 3),
                                   dtype=jnp.float32)
        out = synth.run(noise, styles)  # warm
        out.block_until_ready()
        t0 = time.time()
        out = synth.run(noise, styles)
        out.block_until_ready()
        total_iters = sum(sum(r) for r in synth.iters_table)
        print(f"full run iters={iters} ({total_iters} OT steps): "
              f"{time.time()-t0:.3f}s", flush=True)

    # micro: one OT iteration at each depth's 512px scale (post-PCA C~half)
    key = jax.random.key(1)
    for c, n in [(48, 512 * 512), (96, 256 * 256), (200, 128 * 128)]:
        feat = jax.random.normal(key, (1, int(n ** 0.5), int(n ** 0.5), c)) ** 2
        style = jax.random.normal(jax.random.fold_in(key, 1),
                                  (1, int(n ** 0.5), int(n ** 0.5), c)) ** 2
        stats = transport.style_stats(style, need_samples=False)
        step = jax.jit(lambda k, f: transport.ot_step_moment(k, f, stats, "chol"))
        dt = timed(step, key, feat, n=10)
        print(f"ot_step chol C={c} N={n}: {dt*1000:.2f} ms", flush=True)

        rot = jax.jit(lambda k: random_rotation(k, c))
        print(f"  random_rotation C={c}: {timed(rot, key, n=10)*1000:.2f} ms",
              flush=True)

        rot40 = jax.jit(lambda k: jax.vmap(
            lambda kk: random_rotation(kk, c))(jax.random.split(k, 40)))
        print(f"  40x vmapped rotations C={c}: {timed(rot40, key, n=5)*1000:.2f} ms",
              flush=True)

        chol = jax.jit(lambda m: jnp.linalg.cholesky(m @ m.T + jnp.eye(c)))
        g = jax.random.normal(key, (c, c))
        print(f"  cholesky C={c}: {timed(chol, g, n=10)*1000:.2f} ms", flush=True)


if __name__ == "__main__":
    main()

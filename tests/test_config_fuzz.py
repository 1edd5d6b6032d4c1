"""Deterministic config-composition sweep.

The individual suites test each feature's axis; this sweep composes them
randomly (seeded — reproducible) and asserts every VALID combination runs to
a finite, correctly-shaped output at tiny sizes, and every invalid one
raises ValueError (never crashes deeper in the stack). This is where
feature-interaction bugs (e.g. tileable x out_width x mixing x pca_bucket)
would surface first.
"""

import numpy as np
import pytest

import jax

from optimaltextures_tpu import core
from optimaltextures_tpu.config import OptexConfig
from optimaltextures_tpu.utils import imageio

REF = "/root/reference"
S = [f"{REF}/style/graffiti.jpg", f"{REF}/style/zebra.jpg",
     f"{REF}/style/pattern-small.jpg"]


def _loads(paths, size):
    imgs = [imageio.load_image(p, size, oversize=False) for p in paths]
    w = min(min(i.shape[2] for i in imgs), size)
    return [i[:, :size, :w] for i in imgs]


def _sample_cfg(rng):
    n_styles = int(rng.choice([1, 1, 2, 3]))
    use_content = bool(rng.random() < 0.3) and n_styles == 1
    kw = dict(
        size=64,
        passes=int(rng.choice([1, 2])),
        iters=int(rng.choice([2, 4])),
        depth=int(rng.choice([1, 2])),
        seed=int(rng.integers(1000)),
        hist_mode=str(rng.choice(["chol", "pca", "sym", "cdf", "sort"])),
        no_pca=bool(rng.random() < 0.3),
        no_multires=bool(rng.random() < 0.7),
        style=["s"] * n_styles,
        pca_bucket=int(rng.choice([0, 0, 16])),
        tileable=bool(rng.random() < 0.25),
        content_anchor=str(rng.choice(["index", "depth"])),
        compat_schedule_quirk=bool(rng.random() < 0.8),
        cov_propagation=bool(rng.random() < 0.8),
    )
    if rng.random() < 0.2:
        # r3: on-device rank decision (invalid with no_pca/pca_bucket — the
        # sweep asserts those reject cleanly)
        kw["pca_traced_k"] = True
    if n_styles > 1 and rng.random() < 0.5:
        kw["mixing_weights"] = [float(w) for w in
                                rng.uniform(0.1, 1.0, n_styles)]
    if not use_content and rng.random() < 0.25:
        kw["out_width"] = int(rng.choice([32, 96]))
    if not use_content:
        kw["batch"] = int(rng.choice([1, 1, 2, 4]))
    if rng.random() < 0.3:
        # r4 capacity knob: valid only for chunk-divisible moment-mode
        # synthesis with cov_propagation — invalid draws must reject
        # cleanly, valid ones must match the monolithic math (asserted
        # finite+shaped here; exactness has its own equality tests)
        kw["batch_chunk"] = int(rng.choice([1, 2, 3]))
    if use_content:
        kw["content"] = f"{REF}/content/rocket.jpg"
        kw["content_strength"] = float(rng.choice([0.0, 0.2]))
        if rng.random() < 0.5:
            kw["color_transfer"] = str(rng.choice(["lum", "opt"]))
    return kw, n_styles, use_content


def test_random_config_compositions():
    # default seed is pinned (deterministic CI); set OPTEX_FUZZ_SEED to
    # sweep fresh composition samples in an exploratory session
    import os

    rng = np.random.default_rng(int(os.environ.get("OPTEX_FUZZ_SEED",
                                                   0xC0FFEE)))
    ran = 0
    for trial in range(24):
        kw, n_styles, use_content = _sample_cfg(rng)
        try:
            cfg = OptexConfig(**kw).validate()
        except ValueError:
            continue  # invalid combination correctly rejected
        styles = _loads(S[:n_styles], cfg.size)
        content = (imageio.load_image(kw["content"], cfg.size,
                                      oversize=False) if use_content else None)
        if cfg.tileable:
            # tiny sizes may violate the stride rule; that must raise, not
            # crash
            try:
                synth = core.Synthesizer(cfg)
            except ValueError:
                continue
        else:
            synth = core.Synthesizer(cfg)
        shape = content.shape if content is not None else \
            (cfg.batch, cfg.size, cfg.out_width or cfg.size, 3)
        noise = jax.random.uniform(jax.random.key(trial), shape)
        out = np.asarray(synth.run(noise, styles, content))
        assert np.isfinite(out).all(), kw
        # expected final H x W follows the resize plan (faithful reference
        # quirk: passes=1 + multires renders at the 256 linspace START, so
        # the output is NOT cfg.size — mirrored here, not "fixed")
        cur = shape[1:3]
        for (_, rs, cs) in synth._plan_passes(
                shape[1:3], content.shape[1:3] if content is not None
                else None):
            if rs:
                cur = cs
        assert out.shape == (shape[0], *cur, 3), (out.shape, cur, kw)
        ran += 1
    # the sweep must actually exercise a healthy number of valid combos
    assert ran >= 15, ran

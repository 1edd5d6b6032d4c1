"""Statistical quality GATE (VERDICT r2 weak #5 / next-step #8).

tools/quality_report.py measures how far each config's output moves the
VGG feature distribution from uniform noise toward the style exemplar; this
file turns those metrics into hard thresholds so a quality regression (bad
schedule change, broken matching step, basis bug) FAILS the suite instead
of shipping silently. The reference's only validation was eyeballing
output/*.jpg (SURVEY §4).

Calibration (CPU, 128px, depth 3, 120 iters, seed 5 — this exact config):
chol lands at rel_mean 0.36 / rel_cov 0.62 / sw1 0.68 against a noise
anchor of 1.22 / 0.95 / 2.16; sort and cdf within a few percent. The gate
asserts ratios with ~40% headroom over those measurements; noise anchors
are stable across seeds (post-ReLU VGG statistics of uniform noise barely
vary), so the ratios are the meaningful guard.
"""

import numpy as np

from optimaltextures_tpu import core
from optimaltextures_tpu.config import OptexConfig
from optimaltextures_tpu.models.vgg import VGGBank
from optimaltextures_tpu.utils import imageio

STYLE = "/root/reference/style/graffiti.jpg"


def _cloud(enc, img):
    import jax.numpy as jnp

    feat = np.asarray(enc(jnp.asarray(img, jnp.float32)))
    return feat.reshape(-1, feat.shape[-1])


def _metrics(out_f, sty_f, rng):
    rel = lambda a, b: float(np.linalg.norm(a - b) /
                             (np.linalg.norm(b) + 1e-9))
    n = min(len(out_f), len(sty_f), 16384)
    a = out_f[rng.choice(len(out_f), n, replace=False)]
    b = sty_f[rng.choice(len(sty_f), n, replace=False)]
    dirs = rng.normal(size=(a.shape[1], 48))
    dirs /= np.linalg.norm(dirs, axis=0, keepdims=True)
    sw1 = float(np.abs(np.sort(a @ dirs, axis=0) -
                       np.sort(b @ dirs, axis=0)).mean())
    return {"rel_mean": rel(out_f.mean(0), sty_f.mean(0)),
            "rel_cov": rel(np.cov(out_f.T), np.cov(sty_f.T)),
            "sw1": sw1}


def _gate(mode: str, iters: int):
    rng = np.random.default_rng(0)
    bank = VGGBank(3)
    enc = bank.encode_fn(3)
    style = imageio.load_image(STYLE, 128, oversize=False)
    cfg = OptexConfig(size=128, passes=2, iters=iters, depth=3, seed=5,
                      hist_mode=mode, style=[STYLE])
    out, _ = core.synthesize(cfg, [style])
    out = np.clip(np.asarray(out), 0.0, 1.0)

    sty_f = _cloud(enc, np.asarray(style))
    out_m = _metrics(_cloud(enc, out), sty_f, rng)
    noise = rng.uniform(size=out.shape).astype(np.float32)
    noise_m = _metrics(_cloud(enc, noise), sty_f, rng)

    # a synthesis run must close most of the noise->style gap at relu3_1
    assert out_m["rel_mean"] < 0.55 * noise_m["rel_mean"], (out_m, noise_m)
    assert out_m["sw1"] < 0.55 * noise_m["sw1"], (out_m, noise_m)
    assert out_m["rel_cov"] < 0.90 * noise_m["rel_cov"], (out_m, noise_m)
    # and in absolute terms land in the calibrated band (regression fence)
    assert out_m["rel_mean"] < 0.60, out_m
    assert out_m["sw1"] < 1.10, out_m


def test_quality_gate_chol():
    _gate("chol", 120)


def test_quality_gate_sort():
    # fewer iters: sort's CPU cost is ~2x chol's; the gate margins hold
    _gate("sort", 60)

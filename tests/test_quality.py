"""Statistical quality gates (SURVEY §4c): after synthesis, the output's VGG
feature distribution must approach the style's — measured as relative error
of channel means/covariances and a sliced-Wasserstein probe. Exact pixel
parity with the reference is impossible across RNG backends by construction;
this is the cross-backend acceptance criterion."""

import numpy as np

import jax
import jax.numpy as jnp

from optimaltextures_tpu import core
from optimaltextures_tpu.config import OptexConfig
from optimaltextures_tpu.models.vgg import VGGBank
from optimaltextures_tpu.utils import imageio

STYLE = "/root/reference/style/graffiti.jpg"


def _feature_stats(feat):
    f = np.asarray(feat).reshape(-1, feat.shape[-1])
    return f.mean(0), np.cov(f.T)


def test_synthesis_matches_style_feature_stats():
    size = 128
    cfg = OptexConfig(size=size, passes=2, iters=60, depth=3, seed=0,
                      style=[STYLE], no_multires=True)
    style = imageio.load_image(STYLE, size, oversize=False)
    out, _ = core.synthesize(cfg, [style])

    bank = VGGBank(3)
    enc = bank.encode_fn(3)
    sf_mu, sf_cov = _feature_stats(enc(jnp.asarray(style)))
    of_mu, of_cov = _feature_stats(enc(jnp.clip(jnp.asarray(out), 0, 1)))

    # noise baseline for scale: how far does uniform noise sit from the style?
    noise = jax.random.uniform(jax.random.key(1), style.shape)
    nf_mu, nf_cov = _feature_stats(enc(noise))

    def rel(a, b):
        return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9)

    # synthesis must close most of the noise->style gap (chol matches the
    # first two moments, through an eps=1 ridge and a lossy decoder — the
    # residual covariance gap is structural, not a bug)
    assert rel(of_mu, sf_mu) < 0.35 * rel(nf_mu, sf_mu) + 0.05, \
        (rel(of_mu, sf_mu), rel(nf_mu, sf_mu))
    assert rel(of_cov, sf_cov) < 0.65 * rel(nf_cov, sf_cov) + 0.05, \
        (rel(of_cov, sf_cov), rel(nf_cov, sf_cov))


def test_sliced_wasserstein_decreases():
    """Random 1-D projections of the output's features are close to the
    style's in W1, much closer than noise is. Uses hist_mode="sort" (exact
    sliced OT) — the mode whose contract IS marginal-distribution transport
    (chol only moves two moments, so W1 is not its acceptance metric).
    Depth >= 3 matters: shallow-only synthesis can't form style structure
    (measured: depth-2/40-iter output lands FARTHER than noise in W1)."""
    size = 128
    cfg = OptexConfig(size=size, passes=2, iters=150, depth=3, seed=3,
                      style=[STYLE], no_multires=True, hist_mode="sort")
    style = imageio.load_image(STYLE, size, oversize=False)
    out, _ = core.synthesize(cfg, [style])

    bank = VGGBank(2)
    enc = bank.encode_fn(2)
    sf = np.asarray(enc(jnp.asarray(style))).reshape(-1, 128)
    of = np.asarray(enc(jnp.clip(jnp.asarray(out), 0, 1))).reshape(-1, 128)
    nf = np.asarray(enc(jax.random.uniform(jax.random.key(9), style.shape))
                    ).reshape(-1, 128)

    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(16, 128))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    def sw(a, b):
        d = 0.0
        for u in dirs:
            pa, pb = np.sort(a @ u), np.sort(b @ u)
            m = min(len(pa), len(pb))
            ia = (np.arange(m) * len(pa) / m).astype(int)
            ib = (np.arange(m) * len(pb) / m).astype(int)
            d += np.abs(pa[ia] - pb[ib]).mean()
        return d / len(dirs)

    assert sw(of, sf) < 0.5 * sw(nf, sf), (sw(of, sf), sw(nf, sf))


def test_quality_report_metrics_unit():
    """tools/quality_report's metric block: identical clouds score ~0 on
    every metric; a shifted cloud scores higher."""
    from tools.quality_report import _metrics

    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, (4096, 8)).astype(np.float32)
    same = _metrics(a, a.copy(), np.random.default_rng(1))
    assert same["rel_mean"] < 1e-6 and same["rel_cov"] < 1e-6
    assert same["sw1"] < 0.05  # subsampling noise only
    shifted = _metrics(a + 2.0, a, np.random.default_rng(1))
    assert shifted["sw1"] > 10 * max(same["sw1"], 1e-3)
    assert shifted["rel_mean"] > 1.0

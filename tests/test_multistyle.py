"""N-style texture mixing (extension beyond the reference's 2-style cap,
``/root/reference/optex.py:211-219``).

The generalized blend — region i of a categorical mask shows
``sum_j w_j * hist_match(S_i -> S_j)`` — must reduce EXACTLY to the
reference's 2-style formula (optex.py:193-206) for weights (1-alpha, alpha),
so the N=2 parity contract is untouched while 3+ styles become expressible.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optimaltextures_tpu import core
from optimaltextures_tpu.config import OptexConfig
from optimaltextures_tpu.utils import imageio

REF = "/root/reference/style"
S3 = [f"{REF}/graffiti.jpg", f"{REF}/zebra.jpg", f"{REF}/pattern-small.jpg"]


def _loads(paths, size=64):
    # first dim loads to `size`, width follows aspect — crop to a common
    # square so mixing's same-shape requirement holds
    imgs = [imageio.load_image(p, size, oversize=False) for p in paths]
    w = min(min(i.shape[2] for i in imgs), size)
    return [i[:, :size, :w] for i in imgs]


def test_multi_reduces_to_pair_blend():
    """_mix_multi_jit with N=2 and the SAME binary mask == _mix_pair_jit."""
    key = jax.random.key(0)
    a = jax.random.normal(jax.random.fold_in(key, 1), (1, 8, 8, 16)) ** 2
    b = jax.random.normal(jax.random.fold_in(key, 2), (1, 8, 8, 16)) ** 2
    m = jnp.ceil(jax.random.uniform(jax.random.fold_in(key, 3),
                                    (1, 8, 8, 1)) - 0.3)
    alpha = 0.3
    ref = core._mix_pair_jit(a, b, m, mode="chol", alpha=alpha)
    onehot = jnp.concatenate([m, 1.0 - m], axis=-1)
    gen = core._mix_multi_jit((a, b), onehot,
                              jnp.asarray([1.0 - alpha, alpha]), mode="chol")
    np.testing.assert_allclose(np.asarray(gen), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_multi_mix_identity_when_styles_equal():
    """Mixing a style with itself (any weights) must return it unchanged:
    hist_match(S -> S) is (near-)identity and the mask partitions unity."""
    key = jax.random.key(4)
    a = jax.random.normal(key, (1, 8, 8, 16)) ** 2
    regions = jax.random.categorical(
        jax.random.fold_in(key, 1), jnp.log(jnp.asarray([0.5, 0.3, 0.2])),
        shape=(8, 8))
    onehot = jax.nn.one_hot(regions, 3, dtype=jnp.float32)[None]
    out = core._mix_multi_jit((a, a, a), onehot,
                              jnp.asarray([0.5, 0.3, 0.2]), mode="chol")
    np.testing.assert_allclose(np.asarray(out), np.asarray(a), atol=5e-2)


def test_categorical_mask_matches_weights():
    w = jnp.asarray([0.7, 0.2, 0.1])
    regions = jax.random.categorical(jax.random.key(5), jnp.log(w),
                                     shape=(256, 256))
    freqs = np.asarray([(np.asarray(regions) == i).mean() for i in range(3)])
    np.testing.assert_allclose(freqs, np.asarray(w), atol=0.02)


def test_three_style_mixing_end_to_end():
    cfg = OptexConfig(size=64, passes=1, iters=6, no_multires=True, depth=2,
                      seed=11, style=S3)
    styles = _loads(S3)
    out, _ = core.synthesize(cfg, styles)
    out = np.asarray(out)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(out).all()
    # seeded reruns are byte-identical (mask + rotations keyed)
    out2, _ = core.synthesize(cfg, styles)
    np.testing.assert_array_equal(out, np.asarray(out2))


def test_three_style_weights_shift_statistics():
    """Weights heavily favoring one style pull the output's pixel mean
    toward that style's."""
    styles = _loads([f"{REF}/zebra.jpg", f"{REF}/green-paint-large.jpg",
                     f"{REF}/pattern-small.jpg"])
    means = []
    for w in ([0.9, 0.05, 0.05], [0.05, 0.9, 0.05]):
        cfg = OptexConfig(size=64, passes=1, iters=8, no_multires=True,
                          depth=2, seed=3, style=["a", "b", "c"],
                          mixing_weights=w)
        out, _ = core.synthesize(cfg, styles)
        means.append(float(jnp.asarray(out).mean()))
    m_zebra = float(np.asarray(styles[0]).mean())
    m_green = float(np.asarray(styles[1]).mean())
    # zebra-heavy output is closer to zebra's mean; green-heavy to green's
    assert abs(means[0] - m_zebra) < abs(means[1] - m_zebra)
    assert abs(means[1] - m_green) < abs(means[0] - m_green)


def test_mixing_weights_validation():
    with pytest.raises(ValueError, match="one weight per style"):
        OptexConfig(style=["a", "b", "c"], mixing_weights=[0.5, 0.5]).validate()
    with pytest.raises(ValueError, match="positive"):
        OptexConfig(style=["a", "b"], mixing_weights=[1.0, -1.0]).validate()
    with pytest.raises(ValueError, match="between 1 and 8"):
        OptexConfig(style=["s"] * 9).validate()
    OptexConfig(style=["a", "b", "c"]).validate()  # uniform default is fine


def test_cli_mixing_weights_flag():
    from optimaltextures_tpu.api import config_from_args
    from optimaltextures_tpu.cli import build_parser

    args = build_parser().parse_args(
        ["-s", "a.jpg", "b.jpg", "c.jpg", "--mixing_weights", "3", "2", "1"])
    cfg = config_from_args(args)
    assert cfg.mixing_weights == [3.0, 2.0, 1.0]
    assert len(cfg.style) == 3


def test_two_style_weights_use_generalized_path():
    """With explicit weights, 2 styles take the generalized (categorical
    mask) path — output differs from the alpha path but stays valid."""
    styles = _loads([f"{REF}/graffiti.jpg", f"{REF}/zebra.jpg"])
    base = dict(size=64, passes=1, iters=6, no_multires=True, depth=2, seed=2,
                style=["a", "b"])
    out_alpha, _ = core.synthesize(OptexConfig(**base), styles)
    out_w, _ = core.synthesize(
        OptexConfig(**base, mixing_weights=[0.5, 0.5]), styles)
    assert np.isfinite(np.asarray(out_w)).all()
    assert np.abs(np.asarray(out_alpha) - np.asarray(out_w)).max() > 1e-3


def test_three_style_mixing_under_dp():
    """N-style mixing composes with batch data parallelism: the categorical
    mask + generalized blend happen in replicated style prep, so the DP run
    equals the single-device run."""
    styles = _loads(S3)
    base = dict(size=64, passes=1, iters=4, no_multires=True, depth=2,
                seed=13, style=["a", "b", "c"], batch=8,
                mixing_weights=[0.5, 0.25, 0.25])
    out1, _ = core.synthesize(OptexConfig(**base), styles)
    out8, _ = core.synthesize(OptexConfig(**base, num_devices=8), styles)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(out1),
                               rtol=2e-3, atol=2e-3)


def test_mix_weights_are_traced_not_static():
    """Different weight vectors must reuse ONE compiled mix program (a
    serving instance sweeps weights without paying remote recompiles)."""
    key = jax.random.key(8)
    sfs = tuple(jax.random.normal(jax.random.fold_in(key, i),
                                  (1, 8, 8, 16)) ** 2 for i in range(3))
    onehot = jax.nn.one_hot(
        jax.random.categorical(key, jnp.zeros(3), shape=(8, 8)), 3,
        dtype=jnp.float32)[None]
    core._mix_multi_jit.clear_cache()
    core._mix_multi_jit(sfs, onehot, jnp.asarray([0.5, 0.3, 0.2]),
                        mode="chol")
    core._mix_multi_jit(sfs, onehot, jnp.asarray([0.1, 0.1, 0.8]),
                        mode="chol")
    assert core._mix_multi_jit._cache_size() == 1

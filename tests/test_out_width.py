"""--out_width: non-square synthesis (extension; the reference can only
start from size x size noise, optex.py:263-265)."""

import numpy as np
import pytest

from optimaltextures_tpu import core
from optimaltextures_tpu.config import OptexConfig
from optimaltextures_tpu.utils import imageio

STYLE = "/root/reference/style/graffiti.jpg"


def test_wide_synthesis_end_to_end():
    cfg = OptexConfig(size=64, out_width=128, passes=1, iters=6,
                      no_multires=True, depth=2, seed=0, style=[STYLE])
    styles = [imageio.load_image(STYLE, 64, oversize=False)]
    out, _ = core.synthesize(cfg, styles)
    assert out.shape == (1, 64, 128, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_wide_synthesis_multires_chain():
    """The width follows the pass sizes: 64x128 via the degenerate
    [256, 64] pyramid means pass 0 runs at 256x512."""
    cfg = OptexConfig(size=64, out_width=128, passes=2, iters=4, depth=2,
                      seed=1, style=[STYLE])
    synth = core.Synthesizer(cfg)
    plan = synth._plan_passes((64, 128), None)
    assert [p[2] for p in plan if p[1]] == [(256, 512), (64, 128)]
    styles = [imageio.load_image(STYLE, 64, oversize=False)]
    out = synth.run(
        np.random.default_rng(0).uniform(size=(1, 64, 128, 3)).astype("f4"),
        styles)
    assert out.shape == (1, 64, 128, 3)


def test_out_width_tileable_composes():
    cfg = OptexConfig(size=64, out_width=96, passes=1, iters=4,
                      no_multires=True, depth=2, seed=2, style=[STYLE],
                      tileable=True)
    styles = [imageio.load_image(STYLE, 64, oversize=False)]
    out, _ = core.synthesize(cfg, styles)
    assert out.shape == (1, 64, 96, 3)


def test_out_width_validation_and_codec():
    with pytest.raises(ValueError, match="synthesis only"):
        OptexConfig(out_width=128, content="c.jpg").validate()
    with pytest.raises(ValueError, match="multiple of 32"):
        OptexConfig(out_width=16).validate()
    with pytest.raises(ValueError, match="multiple of 32"):
        OptexConfig(out_width=100).validate()
    name = imageio.output_name(OptexConfig(size=64, out_width=128,
                                           style=["s.jpg"]))
    assert name.endswith("64x128")


def test_out_width_cli():
    from optimaltextures_tpu.api import config_from_args
    from optimaltextures_tpu.cli import build_parser

    args = build_parser().parse_args(["--size", "64", "--out_width", "256"])
    assert config_from_args(args).out_width == 256


def test_out_width_gate_never_falsely_skips():
    """The reference's EITHER-dim resize gate would skip passes whose height
    target equals the current width (e.g. 512x576: width 512 matches the
    final height); the out_width plan gates on the (H, W) pair instead, so
    the final output is exactly the requested size."""
    cfg = OptexConfig(size=512, out_width=576, passes=5, style=[STYLE])
    synth = core.Synthesizer(cfg)
    plan = synth._plan_passes((512, 576), None)
    # final resize target is exactly the requested output size
    targets = [p[2] for p in plan if p[1]]
    assert targets[-1] == (512, 576), plan
    # the width chain follows the pass sizes monotonically
    assert all(t[0] <= n[0] and t[1] <= n[1]
               for t, n in zip(targets, targets[1:])), targets


def test_out_width_composes_with_spatial_sharding():
    """Width is unsharded under spatial (H) sharding, so out_width composes;
    the SP run equals the single-device run."""
    import jax

    styles = [imageio.load_image(STYLE, 64, oversize=False)]
    base = dict(size=64, out_width=96, passes=1, iters=4, no_multires=True,
                depth=2, seed=6, style=[STYLE])
    noise = np.asarray(
        np.random.default_rng(1).uniform(size=(1, 64, 96, 3)), dtype="f4")
    out1 = core.Synthesizer(OptexConfig(**base)).run(noise, styles)
    out8 = core.Synthesizer(OptexConfig(**base, spatial_devices=8)).run(
        noise, styles)
    assert out1.shape == (1, 64, 96, 3)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(out1),
                               rtol=2e-3, atol=2e-3)

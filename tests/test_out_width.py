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
    with pytest.raises(ValueError, match=">= 32"):
        OptexConfig(out_width=16).validate()
    name = imageio.output_name(OptexConfig(size=64, out_width=128,
                                           style=["s.jpg"]))
    assert name.endswith("64x128")


def test_out_width_cli():
    from optimaltextures_tpu.api import config_from_args
    from optimaltextures_tpu.cli import build_parser

    args = build_parser().parse_args(["--size", "64", "--out_width", "256"])
    assert config_from_args(args).out_width == 256

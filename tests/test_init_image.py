"""--init: start the pastiche from an image instead of noise (extension;
the reference always starts from uniform noise, optex.py:263-265)."""

import numpy as np
import pytest

from optimaltextures_tpu import api
from optimaltextures_tpu.config import OptexConfig
from optimaltextures_tpu.utils import imageio

STYLE = "/root/reference/style/graffiti.jpg"
CONTENT = "/root/reference/content/rocket.jpg"


def _cfg(tmp_path, **kw):
    base = dict(size=64, passes=1, iters=4, no_multires=True, depth=2, seed=0,
                style=[STYLE], output_dir=str(tmp_path))
    base.update(kw)
    return OptexConfig(**base)


def test_init_run_and_determinism(tmp_path):
    cfg = _cfg(tmp_path, init=CONTENT)
    out, _, paths = api.run_files(cfg)
    assert out.shape[0] == 1 and np.isfinite(out).all()
    assert "init-rocket" in paths[0]
    # seeded: identical rerun
    out2, _, _ = api.run_files(cfg)
    np.testing.assert_array_equal(out, out2)
    # init changes the trajectory vs noise
    out_noise, _, _ = api.run_files(_cfg(tmp_path))
    assert np.abs(out - out_noise).max() > 1e-3


def test_init_batch_rejected(tmp_path):
    # identical starts + a shared rotation stream would give N identical
    # images for N x the device work — reject instead
    cfg = _cfg(tmp_path, init=CONTENT, batch=2)
    with pytest.raises(ValueError, match="identical"):
        api.run_files(cfg)


def test_init_content_shape_mismatch(tmp_path):
    # graffiti loads 96x64 at size 64 (aspect) while rocket content is 64x64
    cfg = _cfg(tmp_path, init=STYLE, content=CONTENT)
    with pytest.raises(ValueError, match="must match"):
        api.run_files(cfg)


def test_init_cli_flag():
    from optimaltextures_tpu.api import config_from_args
    from optimaltextures_tpu.cli import build_parser

    args = build_parser().parse_args(["--init", "x.png"])
    assert config_from_args(args).init == "x.png"


def test_init_mix_alpha_keyword_guard():
    with pytest.raises(TypeError, match="keyword"):
        api.mix_textures(STYLE, STYLE, 0.7)  # old positional-alpha call

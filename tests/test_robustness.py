"""Robustness: odd inputs the reference would meet in the wild."""

import numpy as np
import pytest

from PIL import Image

import jax
import jax.numpy as jnp

from optimaltextures_tpu import core
from optimaltextures_tpu.config import OptexConfig
from optimaltextures_tpu.utils import imageio

STYLE = "/root/reference/style/graffiti.jpg"


def test_grayscale_style_loads_rgb(tmp_path):
    p = str(tmp_path / "gray.png")
    Image.new("L", (100, 80), 128).save(p)
    arr = imageio.load_image(p, 64, oversize=False)
    assert arr.shape[-1] == 3  # PIL convert("RGB")


def test_tiny_style_image(tmp_path):
    """A style smaller than the output still synthesizes (styles load
    oversize=True -> capped at source dims, rounded to 32)."""
    p = str(tmp_path / "tiny.png")
    rng = np.random.default_rng(0)
    Image.fromarray((rng.random((40, 40, 3)) * 255).astype(np.uint8)).save(p)
    style = imageio.load_image(p, 256, scale=1.0, oversize=True)
    assert style.shape[1] >= 32 and style.shape[2] >= 32
    cfg = OptexConfig(size=64, passes=1, iters=3, no_multires=True, depth=2,
                      seed=0, style=[p])
    out, _ = core.synthesize(cfg, [style])
    assert np.isfinite(np.asarray(out)).all()


def test_extreme_style_scale():
    """style_scale far from 1 exercises the get_size quirk paths."""
    for scale in (0.25, 3.0):
        cfg = OptexConfig(size=96, passes=2, iters=4, depth=2, seed=0,
                          style=[STYLE], style_scale=scale)
        style = imageio.load_image(STYLE, 96, scale=scale, oversize=True)
        out, _ = core.synthesize(cfg, [style])
        assert np.isfinite(np.asarray(out)).all()


def test_nonsquare_content_aspect_preserved():
    content = imageio.load_image("/root/reference/content/city.jpg", 128,
                                 oversize=False)
    assert content.shape[1] != content.shape[2]  # city is wide
    cfg = OptexConfig(size=128, passes=1, iters=3, no_multires=True, depth=2,
                      seed=0, style=[STYLE],
                      content="/root/reference/content/city.jpg")
    style = imageio.load_image(STYLE, 128, oversize=False)
    out, _ = core.synthesize(cfg, [style], content)
    assert np.asarray(out).shape == content.shape


def test_single_iteration_budget():
    """iters=1 truncates to zero iterations at some layers — must not crash."""
    cfg = OptexConfig(size=64, passes=1, iters=1, no_multires=True, depth=2,
                      seed=0, style=[STYLE])
    style = imageio.load_image(STYLE, 64, oversize=False)
    out, _ = core.synthesize(cfg, [style])
    assert np.isfinite(np.asarray(out)).all()


def test_weights_dir_env(tmp_path, monkeypatch):
    """OPTEX_WEIGHTS_DIR redirects weight loading; missing dir errors clearly."""
    from optimaltextures_tpu.models import weights

    monkeypatch.setenv("OPTEX_WEIGHTS_DIR", str(tmp_path))
    assert weights.available_depths() == []
    with pytest.raises(FileNotFoundError, match="convert_weights"):
        weights.max_depth()

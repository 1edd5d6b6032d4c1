"""Filename codec goldens: the reference's committed outputs encode their
configs in the filename (util.py:45-65); our codec must reproduce those names
for the same configs."""

import numpy as np

from optimaltextures_tpu.config import OptexConfig
from optimaltextures_tpu.utils import imageio


def test_output_name_style_transfer_golden():
    # matches reference output/lava-small_rocket_strength0.3_pcahist_256.jpg
    cfg = OptexConfig(style=["style/lava-small.jpg"], content="content/rocket.jpg",
                      content_strength=0.3, hist_mode="pca", size=256)
    assert imageio.output_name(cfg) == "lava-small_rocket_strength0.3_pcahist_256"


def test_output_name_full_config_golden():
    # matches reference output/green-paint-large_city_strength0.1_cdfhist_scale0.5_lum_2048.jpg
    cfg = OptexConfig(style=["style/green-paint-large.jpg"],
                      content="content/city.jpg", content_strength=0.1,
                      hist_mode="cdf", style_scale=0.5, color_transfer="lum",
                      size=2048)
    assert imageio.output_name(cfg) == \
        "green-paint-large_city_strength0.1_cdfhist_scale0.5_lum_2048"


def test_output_name_mixing_golden():
    # matches reference output/xo-small_graffiti-small_blend0.5_bridge_strength0.05_pcahist_1024.jpg
    cfg = OptexConfig(style=["style/xo-small.jpg", "style/graffiti-small.jpg"],
                      mixing_alpha=0.5, content="content/bridge.jpg",
                      content_strength=0.05, hist_mode="pca", size=1024)
    assert imageio.output_name(cfg) == \
        "xo-small_graffiti-small_blend0.5_bridge_strength0.05_pcahist_1024"


def test_output_name_flags():
    cfg = OptexConfig(style=["s/a.jpg"], no_pca=True, no_multires=True, size=512)
    assert imageio.output_name(cfg) == "a_cholhist_no_pca_no_multires_512"


def test_save_images_batch(tmp_path):
    cfg = OptexConfig(style=["s/a.jpg"], size=64, output_dir=str(tmp_path))
    out = np.random.default_rng(0).random((2, 8, 8, 3)).astype(np.float32)
    paths = imageio.save_images(out, cfg)
    assert [p.split("/")[-1] for p in paths] == \
        ["a_cholhist_64_1.png", "a_cholhist_64_2.png"]
    import os
    assert all(os.path.exists(p) for p in paths)


def test_save_images_clamps(tmp_path):
    from PIL import Image

    cfg = OptexConfig(style=["s/a.jpg"], size=64, output_dir=str(tmp_path))
    out = np.full((1, 4, 4, 3), 7.5, dtype=np.float32)  # way out of range
    paths = imageio.save_images(out, cfg)
    arr = np.asarray(Image.open(paths[0]))
    assert (arr == 255).all()


def test_load_image_shape_round32():
    arr = imageio.load_image("/root/reference/style/graffiti.jpg", 100,
                             oversize=False)
    assert arr.shape[0] == 1 and arr.shape[3] == 3
    assert arr.shape[1] % 32 == 0 and arr.shape[2] % 32 == 0
    assert arr.dtype == np.float32 and arr.max() <= 1.0

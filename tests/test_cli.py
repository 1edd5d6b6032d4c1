"""CLI surface tests: flag parsing, config mapping, and error paths.
(The full CLI is driven end-to-end on TPU in verification runs; here we test
the parse->config contract without running synthesis.)"""

import pytest

from optimaltextures_tpu import api, cli


def parse(argv):
    return cli.build_parser().parse_args(argv)


def test_defaults_match_reference():
    args = parse([])
    assert args.style == ["style/graffiti.jpg"]
    assert args.size == 512 and args.passes == 5 and args.iters == 500
    assert args.hist_mode == "chol" and args.color_transfer is None
    assert args.content_strength == 0.01  # the CLI default wins (optex.py:231)
    assert args.style_scale == 1.0 and args.mixing_alpha == 0.5
    assert not args.no_pca and not args.no_multires
    assert args.output_dir == "output/"


def test_config_from_args_roundtrip():
    args = parse(["-s", "a.jpg", "b.jpg", "--size", "256", "--hist_mode", "cdf",
                  "--mixing_alpha", "0.3", "--seed", "7", "--batch", "2",
                  "--conv_dtype", "bfloat16", "--num_devices", "2"])
    cfg = api.config_from_args(args)
    assert cfg.style == ["a.jpg", "b.jpg"]
    assert cfg.size == 256 and cfg.hist_mode == "cdf"
    assert cfg.mixing_alpha == 0.3 and cfg.seed == 7 and cfg.batch == 2
    assert cfg.conv_dtype == "bfloat16" and cfg.num_devices == 2
    cfg.validate()


def test_style_count_bounds():
    # 3-8 styles are the N-style mixing extension (the reference caps at 2);
    # 9+ still rejects
    cfg = api.config_from_args(parse(["-s", "a.jpg", "b.jpg", "c.jpg"]))
    cfg.validate()
    cfg9 = api.config_from_args(parse(["-s"] + [f"{i}.jpg" for i in range(9)]))
    with pytest.raises(ValueError, match="between 1 and 8"):
        cfg9.validate()


def test_style_parallel_e2e(tmp_path):
    """--style_parallel writes ONE per-style-named PNG per style (no
    mixing), running the lifted EP path single-device (r3)."""
    import numpy as np
    from PIL import Image

    rc = cli.main(["-s", "/root/reference/style/graffiti.jpg",
                   "/root/reference/style/graffiti.jpg",
                   "--style_parallel", "--size", "64", "--passes", "1",
                   "--iters", "2", "--no_multires", "--depth", "1",
                   "--seed", "0", "--quiet",
                   "--output_dir", str(tmp_path)])
    assert rc == 0
    pngs = sorted(tmp_path.glob("*.png"))
    assert len(pngs) == 1  # same style name twice -> same file, overwritten
    arr = np.asarray(Image.open(pngs[0]))
    assert arr.shape == (64, 64, 3)


def test_style_parallel_rejects_content():
    from optimaltextures_tpu.config import OptexConfig

    cfg = OptexConfig(style=["/root/reference/style/graffiti.jpg"],
                      content="/root/reference/content/rocket.jpg")
    with pytest.raises(ValueError, match="synthesis-only"):
        api.run_style_parallel(cfg)


def test_bad_hist_mode_rejected_by_parser(capsys):
    with pytest.raises(SystemExit):
        parse(["--hist_mode", "nope"])


def test_color_transfer_requires_content():
    from optimaltextures_tpu import core
    from optimaltextures_tpu.config import OptexConfig

    cfg = OptexConfig(style=["/root/reference/style/graffiti.jpg"], size=64,
                      passes=1, iters=2, no_multires=True, depth=1,
                      color_transfer="lum", seed=0)
    from optimaltextures_tpu.utils import imageio

    style = imageio.load_image(cfg.style[0], 64, oversize=False)
    with pytest.raises(ValueError, match="requires content"):
        core.synthesize(cfg, [style])
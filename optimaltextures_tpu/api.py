"""High-level library API: texture synthesis, style transfer, texture mixing,
and color transfer in one call each.

These wrap :class:`optimaltextures_tpu.core.Synthesizer` with host-side image
loading/saving, mirroring the four CLI modes of the reference
(``/root/reference/README.md:16-44``).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from . import core
from .config import OptexConfig
from .utils import imageio


def run_files(cfg: OptexConfig, verbose: bool = False
              ) -> Tuple[np.ndarray, float, List[str]]:
    """Load images per cfg, run, save PNG(s). Returns (output array NHWC,
    seconds, written paths)."""
    cfg = cfg.validate()
    styles = imageio.load_styles(cfg.style, cfg.size, cfg.style_scale)
    if any(s.shape != styles[0].shape for s in styles[1:]):
        raise ValueError("Style images must have the same shape")
    content = imageio.maybe_load_content(cfg.content, cfg.size)
    pastiche = None
    if cfg.init is not None:
        pastiche = imageio.load_image(cfg.init, cfg.size, oversize=False)
        if content is not None and pastiche.shape != content.shape:
            raise ValueError(
                f"--init image loads to {tuple(pastiche.shape)} but the "
                f"content loads to {tuple(content.shape)}; they must match")
        if cfg.batch > 1:
            # every batch element would start identical AND share the run's
            # rotation stream -> N identical outputs for N x the device work
            raise ValueError("batch > 1 with --init produces identical "
                             "images; run batch=1")
    out, seconds = core.synthesize(cfg, styles, content, pastiche=pastiche,
                                   verbose=verbose)
    out_np = np.asarray(out)
    paths = imageio.save_images(out_np, cfg)
    return out_np, seconds, paths


def run_style_parallel(cfg: OptexConfig, verbose: bool = False
                       ) -> Tuple[np.ndarray, float, List[str]]:
    """Style-parallel synthesis: ONE output texture per --style image,
    one style per device when num_devices > 1 (the serving transpose of the
    reference's --batch, SURVEY §2.2), single-device otherwise. PCA and the
    multires schedule fully apply (r3). Returns (outputs (N,H,W,3), seconds,
    written paths — one PNG per style, named per style)."""
    import time

    # reject unsupported combos BEFORE validate(): the grid validation's
    # batch-divisibility message would pre-empt these clearer errors
    if cfg.content is not None:
        raise ValueError("style_parallel is synthesis-only (no content)")
    unsupported = [name for name, bad in [
        ("tileable", cfg.tileable), ("init", cfg.init is not None),
        ("out_width", cfg.out_width is not None), ("batch", cfg.batch != 1),
        ("color_transfer", cfg.color_transfer is not None),
        ("spatial_devices", cfg.spatial_devices > 1)] if bad]
    if unsupported:
        raise ValueError("style_parallel does not support: "
                         + ", ".join(unsupported))
    cfg = cfg.validate()
    styles = imageio.load_styles(cfg.style, cfg.size, cfg.style_scale)
    if any(s.shape != styles[0].shape for s in styles[1:]):
        raise ValueError("style_parallel needs equal style shapes")
    mesh = None
    if cfg.num_devices > 1:
        from .parallel.mesh import make_mesh

        if len(styles) != cfg.num_devices:
            raise ValueError(f"{len(styles)} styles for num_devices="
                             f"{cfg.num_devices}: pass one style per device")
        mesh = make_mesh(cfg.num_devices)

    from .parallel.style_dp import synthesize_style_batch

    t0 = time.time()
    out = synthesize_style_batch(cfg, styles, mesh, verbose=verbose)
    out.block_until_ready()
    seconds = time.time() - t0
    out_np = np.asarray(out)
    paths: List[str] = []
    for i, sp in enumerate(cfg.style):
        sub = dataclasses.replace(cfg, style=[sp])
        paths += imageio.save_images(out_np[i:i + 1], sub)
    return out_np, seconds, paths


def synthesize_texture(style: str, size: int = 512, **overrides) -> np.ndarray:
    """Texture synthesis from noise matched to one style exemplar."""
    cfg = OptexConfig(style=[style], size=size, **overrides)
    out, _, _ = run_files(cfg)
    return out


def transfer_style(style: str, content: str, size: int = 512,
                   content_strength: float = 0.2, **overrides) -> np.ndarray:
    """Style transfer: synthesis pulled toward a content image's structure."""
    cfg = OptexConfig(style=[style], content=content, size=size,
                      content_strength=content_strength, **overrides)
    out, _, _ = run_files(cfg)
    return out


def mix_textures(style_a: str, style_b: str, *more_styles: str,
                 alpha: float = 0.5, weights=None, size: int = 512,
                 **overrides) -> np.ndarray:
    """Texture mixing with a random spatial mask.

    Two styles reproduce the reference's alpha blend exactly; three or more
    (an extension — the reference caps at 2) mix by ``weights`` (one positive
    weight per style, default uniform; see ``OptexConfig.mixing_weights``).

    ``alpha`` is keyword-only (it was the 3rd positional argument before
    varargs styles existed — a positional float would otherwise be silently
    swallowed as a style path)."""
    for s in (style_a, style_b, *more_styles):
        if not isinstance(s, str):
            raise TypeError(
                f"style paths must be strings, got {s!r} — if this was "
                "alpha, pass it by keyword: mix_textures(a, b, alpha=...)")
    cfg = OptexConfig(style=[style_a, style_b, *more_styles],
                      mixing_alpha=alpha, mixing_weights=weights, size=size,
                      **overrides)
    out, _, _ = run_files(cfg)
    return out


def transfer_color(style: str, content: str, mode: str = "opt",
                   size: int = 512, **overrides) -> np.ndarray:
    """Style transfer that keeps the content image's colors (lum | opt)."""
    cfg = OptexConfig(style=[style], content=content, color_transfer=mode,
                      size=size, **overrides)
    out, _, _ = run_files(cfg)
    return out


def synthesize_style_batch(styles: List[str], size: int = 512,
                           num_devices: int = 0, **overrides) -> np.ndarray:
    """Style-PARALLEL synthesis: one texture per style, one style per device
    (collective-free throughput scaling — the serving transpose of the
    reference's joint-stats ``--batch``). Styles must load to one shape.
    ``num_devices`` defaults to len(styles); 1 runs the same per-style math
    on a single device. PCA + the multires schedule fully apply (the r2
    no-PCA/uniform-schedule restrictions are lifted). Returns (N, H, W, 3)."""
    from .parallel.mesh import make_mesh
    from .parallel.style_dp import synthesize_style_batch as _batch

    cfg = OptexConfig(style=list(styles), size=size, **overrides)
    imgs = [imageio.load_image(s, size, oversize=False) for s in styles]
    n = num_devices or len(styles)
    mesh = make_mesh(n) if n > 1 else None
    return np.asarray(_batch(cfg, imgs, mesh))


def config_from_args(args) -> OptexConfig:
    """Build a config from an argparse Namespace with matching field names."""
    fields = {f.name for f in dataclasses.fields(OptexConfig)}
    return OptexConfig(**{k: v for k, v in vars(args).items() if k in fields})

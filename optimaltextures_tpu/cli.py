"""CLI mirroring the reference's flag surface (``/root/reference/optex.py:
222-244``), with TPU-appropriate replacements for the torch perf toggles:

* ``--no_tf32 / --cudnn_benchmark / --script / --compile / --memory_format``
  have no TPU meaning; jit is always on. ``--conv_dtype bfloat16`` is the
  TPU analogue of tf32 (fast matmul units), and ``--cache_dir`` enables the
  persistent XLA compilation cache (the analogue of cudnn_benchmark's
  autotune persistence).
* ``--device`` (dead in the reference — parsed then ignored, optex.py:251)
  here honestly selects a jax platform.
* ``--seed`` controls EVERYTHING including rotations (the reference's scipy
  rotations ignored its seed).

Run: python -m optimaltextures_tpu.cli --style style/graffiti.jpg --size 512
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    from . import __version__

    p = argparse.ArgumentParser(
        prog="optex-tpu",
        description="TPU-native texture synthesis & style transfer via sliced "
                    "optimal transport")
    p.add_argument("--version", action="version",
                   version=f"optex-tpu {__version__}")
    p.add_argument("-s", "--style", type=str, nargs="+",
                   default=["style/graffiti.jpg"],
                   help="style exemplar images (2+ = texture mixing; the "
                        "reference caps at 2, 3-8 is an extension)")
    p.add_argument("-c", "--content", type=str, default=None,
                   help="content image for style transfer")
    p.add_argument("--init", type=str, default=None,
                   help="starting pastiche image instead of noise "
                        "(re-texture/refine; extension beyond the reference)")
    p.add_argument("--batch", type=int, default=1,
                   help="number of noise pastiches to synthesize at once")
    p.add_argument("--size", type=int, default=512, help="output size")
    p.add_argument("--out_width", type=int, default=None,
                   help="non-square synthesis width, multiple of 32 "
                        "(extension; height is --size); synthesis only — "
                        "rejected with a content image")
    p.add_argument("--passes", type=int, default=5,
                   help="loops over the VGG layer stack")
    p.add_argument("--iters", type=int, default=500,
                   help="total sliced-OT iteration budget")
    p.add_argument("--hist_mode", type=str, default="chol",
                   choices=["sym", "pca", "chol", "cdf", "sort"],
                   help="histogram matching strategy (sort = exact 1-D OT, "
                        "TPU-native extension beyond the reference)")
    p.add_argument("--color_transfer", type=str, default=None,
                   choices=["lum", "opt"],
                   help="keep the content image's colors")
    p.add_argument("--content_strength", type=float, default=0.01)
    p.add_argument("--style_scale", type=float, default=1.0,
                   help="style detail scale relative to the output")
    p.add_argument("--mixing_alpha", type=float, default=0.5,
                   help="interpolation between 2 styles")
    p.add_argument("--mixing_weights", type=float, nargs="+", default=None,
                   help="one positive weight per style for 3+-style mixing "
                        "(default uniform); with 2 styles overrides "
                        "--mixing_alpha via the generalized blend")
    p.add_argument("--no_pca", action="store_true",
                   help="disable PCA feature reduction (slower)")
    p.add_argument("--no_multires", action="store_true",
                   help="disable multi-scale rendering (slower)")
    p.add_argument("--seed", type=int, default=None,
                   help="seeds every RNG, including rotations")
    p.add_argument("--output_dir", type=str, default="output/")
    # TPU-specific
    p.add_argument("--depth", type=int, default=None,
                   help="max VGG depth (default: deepest available weights)")
    p.add_argument("--num_devices", type=int, default=1,
                   help="shard --batch synthesis over this many chips "
                        "(exact joint statistics via ICI collectives)")
    p.add_argument("--pca_bucket", type=int, default=0,
                   help="round the PCA rank up to this bucket so programs "
                        "stay shape-stable across styles (0 = exact rank); "
                        "mathematically identical via zero-padded eigvecs + "
                        "blockdiag rotations")
    p.add_argument("--pca_traced_k", action="store_true",
                   help="compute the PCA rank on device (full-width "
                        "programs, traced rank mask): zero host syncs "
                        "before the final fetch — lowest latency on "
                        "high-RTT links / small sizes")
    p.add_argument("--spatial_devices", type=int, default=1,
                   help="shard ONE image's height axis over this many chips "
                        "(halo-exchange convs + sequence-parallel OT; "
                        "chol|pca|sym|cdf, content supported)")
    p.add_argument("--content_anchor", type=str, default="index",
                   choices=["index", "depth"],
                   help="depth<5 content-matching rule: 'index' = the "
                        "reference's literal l<=2 positions, 'depth' = "
                        "anchor at VGG depths >= 3 (identical at depth 5)")
    p.add_argument("--style_parallel", action="store_true",
                   help="synthesize ONE texture per --style image instead "
                        "of mixing (one style per chip when --num_devices "
                        "matches the style count; extension beyond the "
                        "reference). With PCA, --pca_bucket 0 (exact-k) is "
                        "forced to 32 — per-style ranks are ragged; the "
                        "bucketed math is still exact per style")
    p.add_argument("--batch_chunk", type=int, default=0,
                   help="micro-batch the conv codec in chunks of this many "
                        "images (peak HBM scales with the chunk, not the "
                        "batch — fits batches past the per-chip capacity "
                        "wall at a ~30%% throughput cost; composes with "
                        "--num_devices, which chunks each chip's local "
                        "shard; moment modes, synthesis; 0 = off)")
    p.add_argument("--no_cov_prop", action="store_true",
                   help="disable covariance-propagated OT loops (recompute "
                        "statistics from data every iteration; A/B tool)")
    p.add_argument("--no_fast_codec", action="store_true",
                   help="disable the Pallas relu1-scale codec kernels on "
                        "eligible runs (batch-128 bf16 reflect; A/B tool)")
    p.add_argument("--tileable", action="store_true",
                   help="seamlessly tileable synthesis: circular conv "
                        "padding + wrap-tap multires resize on the pastiche "
                        "path (extension beyond the reference)")
    p.add_argument("--conv_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="conv stack compute dtype (bfloat16 = faster MXU)")
    p.add_argument("--no_schedule_quirk", action="store_true",
                   help="fix the reference's [l-1] schedule indexing quirk")
    p.add_argument("--no_pallas", action="store_true",
                   help="force the plain-XLA cdf path instead of the fused "
                        "Pallas histogram/remap kernels")
    p.add_argument("--device", type=str, default=None,
                   help="jax platform override (cpu|tpu|...)")
    p.add_argument("--cache_dir", type=str,
                   default=os.path.expanduser("~/.cache/optex_tpu_xla"),
                   help="persistent XLA compilation cache ('' disables)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax profiler trace here")
    p.add_argument("--verbose", action="store_true", default=True)
    p.add_argument("--quiet", dest="verbose", action="store_false")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.device:
        os.environ["JAX_PLATFORMS"] = args.device
    import jax  # deferred so --device can take effect

    if args.cache_dir:
        jax.config.update("jax_compilation_cache_dir", args.cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from . import api
    cfg = api.config_from_args(args)
    cfg.compat_schedule_quirk = not args.no_schedule_quirk
    cfg.use_pallas = not args.no_pallas
    cfg.cov_propagation = not args.no_cov_prop
    cfg.fast_codec = not args.no_fast_codec

    profiler_cm = None
    if args.profile_dir:
        profiler_cm = jax.profiler.trace(args.profile_dir)
        profiler_cm.__enter__()
    try:
        if args.style_parallel:
            _, seconds, paths = api.run_style_parallel(cfg,
                                                       verbose=args.verbose)
        else:
            _, seconds, paths = api.run_files(cfg, verbose=args.verbose)
    finally:
        if profiler_cm is not None:
            profiler_cm.__exit__(None, None, None)

    print("Took:", seconds)
    for path in paths:
        print("saved", path)
    return 0


if __name__ == "__main__":
    sys.exit(main())

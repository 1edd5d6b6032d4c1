"""optex-tpu quickstart: the four modes from Python.

Run:  python examples/quickstart.py [--size 256] [--outdir /tmp/optex_out]
(Each call compiles on first use; the persistent XLA cache makes repeats
fast. On the shared axon tunnel, run one process at a time.)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = "/root/reference"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--outdir", default="/tmp/optex_out")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/optex_tpu_xla"))

    from optimaltextures_tpu import api

    common = dict(size=args.size, output_dir=args.outdir, seed=0,
                  iters=args.iters)

    # 1. texture synthesis from noise
    api.synthesize_texture(f"{REF}/style/graffiti.jpg", **common)

    # 2. style transfer onto a content image
    api.transfer_style(f"{REF}/style/lava-small.jpg",
                       f"{REF}/content/rocket.jpg",
                       content_strength=0.2, **common)

    # 3. two-texture mixing
    api.mix_textures(f"{REF}/style/zebra.jpg", f"{REF}/style/pattern-small.jpg",
                     alpha=0.5, **common)

    # 4. style transfer keeping the content's colors
    api.transfer_color(f"{REF}/style/green-paint-large.jpg",
                       f"{REF}/content/city.jpg", mode="lum", **common)

    # extensions beyond the reference:
    # 5. seamlessly tileable texture (circular conv padding)
    api.synthesize_texture(f"{REF}/style/graffiti.jpg", tileable=True,
                           **common)

    # 6. three-style mixing with weights (reference caps at 2 styles)
    api.mix_textures(f"{REF}/style/zebra.jpg", f"{REF}/style/pattern-small.jpg",
                     f"{REF}/style/lava-small.jpg", weights=[0.4, 0.3, 0.3],
                     **common)

    print("outputs in", args.outdir)


if __name__ == "__main__":
    main()

"""Run the five BASELINE.json configs end-to-end and record timings.

Writes baselines_results.json (config -> {seconds, output, shape}) and saves
every output image. Cold entries include compile time; run twice for warm
numbers (the XLA persistent cache carries over).

Usage: python tools/run_baselines.py [--out /tmp/baselines]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = "/root/reference"

CONFIGS = {
    "1_synthesis_256": dict(style=[f"{REF}/style/graffiti.jpg"], size=256),
    "2_transfer_512": dict(style=[f"{REF}/style/lava-small.jpg"],
                           content=f"{REF}/content/rocket.jpg",
                           content_strength=0.2, size=512),
    "3_mixing_512": dict(style=[f"{REF}/style/zebra.jpg",
                                f"{REF}/style/pattern-small.jpg"],
                         mixing_alpha=0.5, size=512),
    "4_color_opt_1024": dict(style=[f"{REF}/style/green-paint-large.jpg"],
                             content=f"{REF}/content/city.jpg",
                             color_transfer="opt", size=1024),
    "5_highres_2048_lum": dict(style=[f"{REF}/style/green-paint-large.jpg"],
                               content=f"{REF}/content/city.jpg",
                               style_scale=0.5, color_transfer="lum",
                               size=2048),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/baselines")
    ap.add_argument("--only", default=None, help="comma-separated config keys")
    ap.add_argument("--steady", action="store_true",
                    help="run each config twice and report the second "
                         "(in-process steady state, no compile/cache-load)")
    ap.add_argument("--conv_dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="float32 = strict parity config; bfloat16 = the "
                         "serving/bench config")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/optex_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from optimaltextures_tpu import api
    from optimaltextures_tpu.config import OptexConfig

    os.makedirs(args.out, exist_ok=True)
    results = {}
    keys = args.only.split(",") if args.only else list(CONFIGS)
    for name in keys:
        kw = CONFIGS[name]
        cfg = OptexConfig(seed=0, output_dir=args.out,
                          conv_dtype=args.conv_dtype, **kw)
        try:
            out, seconds, paths = api.run_files(cfg)
            if args.steady:
                out, seconds, paths = api.run_files(cfg)
            results[name] = {"seconds": round(seconds, 3),
                             "shape": list(out.shape), "outputs": paths}
            print(f"{name}: {seconds:.2f}s -> {paths}", flush=True)
        except Exception as e:  # keep going; record the failure
            results[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    with open(os.path.join(args.out, "baselines_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()

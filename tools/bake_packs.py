"""Pre-bake style packs for a serving fleet.

A production pool reaches full warm speed on the FIRST request for a style
only if its pack is already on disk (docs/SERVING.md cache layer 3). This
tool runs one synthesis per style through the exact serving request path
(`serve.handle_synthesize` — same base64 token, same load semantics, same
pack filename), so the packs it writes are byte-for-byte the ones serving
would create, ready to ship to $OPTEX_PACK_DIR on the serving hosts.

    python tools/bake_packs.py --styles style/*.jpg --pack_dir /packs \
        [--size 512] [--config pca_bucket=32] [--config hist_mode=chol]

Pass the SAME --config values the fleet serves with: packs are keyed by the
config signature, so a pack baked under a different hist_mode/size/etc. is
a cache miss (by design — statistics differ).
"""

import argparse
import base64
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _parse_config(pairs):
    out = {}
    for p in pairs:
        k, _, v = p.partition("=")
        if not _:
            raise SystemExit(f"--config expects key=value, got {p!r}")
        try:
            out[k] = json.loads(v)
        except json.JSONDecodeError:
            out[k] = v   # bare strings (e.g. hist_mode=chol)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--styles", nargs="+", required=True,
                    help="style image files to bake")
    ap.add_argument("--pack_dir", required=True,
                    help="where packs land (the fleet's $OPTEX_PACK_DIR)")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--config", action="append", default=[],
                    help="extra OptexConfig fields as key=value "
                         "(repeatable); MUST match the serving config")
    args = ap.parse_args()

    os.environ["OPTEX_PACK_DIR"] = args.pack_dir

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/optex_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from optimaltextures_tpu import serve

    cfg = {"size": args.size, **_parse_config(args.config)}
    pool = serve.SynthesizerPool()
    before = set(os.listdir(args.pack_dir)) if os.path.isdir(args.pack_dir) \
        else set()
    for path in args.styles:
        with open(path, "rb") as f:
            b64 = base64.b64encode(f.read()).decode()
        t0 = time.time()
        serve.handle_synthesize(pool, {"style_b64": [b64], "config": cfg})
        print(f"{path}: baked in {time.time() - t0:.1f}s", flush=True)
    after = set(os.listdir(args.pack_dir))
    new = sorted(after - before)
    print(f"{len(new)} new pack(s) in {args.pack_dir}: {new}", flush=True)


if __name__ == "__main__":
    main()

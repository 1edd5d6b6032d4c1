"""What do SYNTHETIC depth-4/5 stages do to OUTPUT quality? (VERDICT r4 #6)

The reference snapshot is missing its own conv4/5 checkpoints
(.MISSING_LARGE_BLOBS; re-verified unobtainable offline every round), so
depth-5 perf rows ride FLOP-identical He-initialized weights
(models.vgg.synthetic_bank). This probe characterizes what those synthetic
deep stages do to output QUALITY: same config, same seed, depth-3 (real
weights) vs depth-5 (synthetic conv4/5 + real-architecture conv1-3 shapes),
scored at the relu3_1 REAL-weight tap (quality_report metrics, noise
anchor). Three readings matter:

* d5_synth vs d3_real: do the extra synthetic stages help, hurt, or wash?
* both vs noise: does the d5 pipeline still converge to the style at all
  (a random deep codec could in principle destroy the shallow matching)?

Writes docs/depth5_quality_r5.json. CPU by default (256px; pass --size 512
on TPU for the serving-scale reading).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
if os.environ.get("PROBE_TPU") != "1":
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

REF = "/root/reference"


def metrics(out_f, sty_f, rng):
    rel = lambda a, b: float(np.linalg.norm(a - b) /
                             (np.linalg.norm(b) + 1e-9))
    m = {"rel_mean": rel(out_f.mean(0), sty_f.mean(0)),
         "rel_cov": rel(np.cov(out_f.T), np.cov(sty_f.T))}
    n = min(len(out_f), len(sty_f), 32768)
    a = out_f[rng.choice(len(out_f), n, replace=False)]
    b = sty_f[rng.choice(len(sty_f), n, replace=False)]
    dirs = rng.normal(size=(a.shape[1], 64))
    dirs /= np.linalg.norm(dirs, axis=0, keepdims=True)
    m["sw1"] = float(np.abs(np.sort(a @ dirs, axis=0)
                            - np.sort(b @ dirs, axis=0)).mean())
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--style", default=f"{REF}/style/graffiti.jpg")
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--json", default="docs/depth5_quality_r5.json")
    ap.add_argument("--save_samples", default=None,
                    help="directory for side-by-side PNGs")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from optimaltextures_tpu import core
    from optimaltextures_tpu.config import OptexConfig
    from optimaltextures_tpu.models.vgg import VGGBank, synthetic_bank
    from optimaltextures_tpu.utils import imageio

    style = imageio.load_image(args.style, args.size, oversize=False)
    bank3 = VGGBank(3)
    enc = bank3.encode_fn(3)
    rng = np.random.default_rng(0)
    sty_f = np.asarray(enc(jnp.asarray(style, jnp.float32)))
    sty_f = sty_f.reshape(-1, sty_f.shape[-1])

    report = {"size": args.size, "style": os.path.basename(args.style),
              "per_seed": [], "note": "metrics at the relu3_1 REAL-weight "
              "tap; d5 runs He-initialized synthetic conv4/5"}
    bank5 = synthetic_bank(5)
    for seed in args.seeds:
        cfg3 = OptexConfig(size=args.size, seed=seed, style=[args.style],
                           depth=3)
        out3, _ = core.synthesize(cfg3, [style])
        cfg5 = OptexConfig(size=args.size, seed=seed, style=[args.style],
                           depth=5)
        synth5 = core.Synthesizer(cfg5, bank=bank5)
        noise = jax.random.uniform(
            jax.random.fold_in(jax.random.key(seed), 999),
            (1, args.size, args.size, 3), dtype=jnp.float32)
        out5 = synth5.run(noise, [jnp.asarray(style)])

        out3 = np.clip(np.asarray(out3), 0, 1)
        out5 = np.clip(np.asarray(out5), 0, 1)
        noise_img = rng.uniform(size=out3.shape).astype(np.float32)
        row = {"seed": seed}
        for tag, img in (("d3_real", out3), ("d5_synth", out5),
                         ("noise", noise_img)):
            f = np.asarray(enc(jnp.asarray(img, jnp.float32)))
            row[tag] = metrics(f.reshape(-1, f.shape[-1]), sty_f, rng)
        report["per_seed"].append(row)
        print(json.dumps(row), flush=True)
        if args.save_samples:
            from PIL import Image

            os.makedirs(args.save_samples, exist_ok=True)
            for tag, img in (("d3_real", out3), ("d5_synth", out5)):
                Image.fromarray((img[0] * 255 + 0.5).astype(np.uint8)).save(
                    os.path.join(args.save_samples,
                                 f"depthprobe_{tag}_s{seed}.png"))

    # summary: mean over seeds
    keys = ["rel_mean", "rel_cov", "sw1"]
    report["summary"] = {
        tag: {k: round(float(np.mean(
            [r[tag][k] for r in report["per_seed"]])), 4) for k in keys}
        for tag in ("d3_real", "d5_synth", "noise")}
    print(json.dumps(report["summary"], indent=1))
    with open(args.json, "w") as f:
        f.write(json.dumps(report) + "\n")


if __name__ == "__main__":
    main()

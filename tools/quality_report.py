"""Quality report for BASELINE config outputs.

Quantifies how well each saved output's VGG feature distribution matches its
style exemplar(s) — the cross-backend acceptance criterion (SURVEY §4c; the
reference validates by eyeball only, its committed output/ images). For each
config output this reports, at relu3_1 (deepest real-weight tap):

* rel_mean / rel_cov — relative error of feature channel means / covariances
  vs the style's;
* sw1 — sliced-Wasserstein-1 over 64 random 1-D projections of the feature
  cloud (the metric sliced OT actually transports);
* *_noise — the same metrics for uniform noise, as the scale anchor: a
  synthesis run should close most of the noise->style gap. Content/color
  configs sit deliberately between style and content (the pull is the
  point), so read their ratios as descriptive, not pass/fail.

Usage: python tools/quality_report.py [--outputs /tmp/baselines]
       [--json docs/quality_rN.json]
Reads <outputs>/baselines_results.json (written by tools/run_baselines.py)
to find each config's output image.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from tools.run_baselines import CONFIGS


def _feature_cloud(enc, img):
    import jax.numpy as jnp

    feat = np.asarray(enc(jnp.asarray(img, jnp.float32)))
    return feat.reshape(-1, feat.shape[-1])


def _metrics(out_f, sty_f, rng):
    rel = lambda a, b: float(np.linalg.norm(a - b) /
                             (np.linalg.norm(b) + 1e-9))
    m = {
        "rel_mean": rel(out_f.mean(0), sty_f.mean(0)),
        "rel_cov": rel(np.cov(out_f.T), np.cov(sty_f.T)),
    }
    # sliced W1: equalize sample counts by subsampling the larger cloud
    n = min(len(out_f), len(sty_f), 32768)
    a = out_f[rng.choice(len(out_f), n, replace=False)]
    b = sty_f[rng.choice(len(sty_f), n, replace=False)]
    dirs = rng.normal(size=(a.shape[1], 64))
    dirs /= np.linalg.norm(dirs, axis=0, keepdims=True)
    pa = np.sort(a @ dirs, axis=0)
    pb = np.sort(b @ dirs, axis=0)
    m["sw1"] = float(np.abs(pa - pb).mean())
    return m


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--outputs", default="/tmp/baselines")
    ap.add_argument("--json", default=None, help="also write the report here")
    ap.add_argument("--depth", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/optex_tpu_xla"))

    from PIL import Image

    from optimaltextures_tpu.models.vgg import VGGBank
    from optimaltextures_tpu.utils import imageio

    results = json.load(open(os.path.join(args.outputs,
                                          "baselines_results.json")))
    bank = VGGBank(args.depth)
    enc = bank.encode_fn(args.depth)
    rng = np.random.default_rng(0)

    report = {}
    for key, res in results.items():
        if "outputs" not in res:   # run_baselines records failures as errors
            print(f"{key}: skipped ({res.get('error', 'no outputs')})")
            report[key] = {"skipped": res.get("error", "no outputs")}
            continue
        cfg = CONFIGS[key]
        out_path = res["outputs"][0]
        out = np.asarray(Image.open(out_path), dtype=np.float32)[None] / 255.0
        styles = imageio.load_styles(cfg["style"], cfg["size"],
                                     cfg.get("style_scale", 1.0))
        out_f = _feature_cloud(enc, out)
        noise = rng.uniform(size=out.shape).astype(np.float32)
        noise_f = _feature_cloud(enc, noise)
        entry = {}
        sty_fs = [_feature_cloud(enc, np.asarray(sty)) for sty in styles]
        for i, sty_f in enumerate(sty_fs):
            tag = f"style{i}" if len(styles) > 1 else "style"
            entry[tag] = _metrics(out_f, sty_f, rng)
            entry[tag + "_noise"] = _metrics(noise_f, sty_f, rng)
        if len(styles) == 2:
            # MIXING configs: the full-cloud rows above compare a MIXTURE to
            # one component — a confounded reading (the r4 "rel_cov 1.82 >
            # noise" anomaly was exactly this; tools/mixing_quality_probe.py
            # decomposes it). The per-REGION rows are the meaningful ones:
            # each relu3_1 position assigned to the nearer style mean (the
            # quality gate's recovery), each region scored against ITS style
            # with noise as anchor.
            da = np.linalg.norm(out_f - sty_fs[0].mean(0), axis=-1)
            db = np.linalg.norm(out_f - sty_fs[1].mean(0), axis=-1)
            to_a = da < db
            entry["region_share_style0"] = float(to_a.mean())
            for i, sel in ((0, to_a), (1, ~to_a)):
                if sel.sum() > 64:
                    entry[f"region{i}_vs_style{i}"] = _metrics(
                        out_f[sel], sty_fs[i], rng)
        report[key] = entry
        print(key)
        for tag, m in entry.items():
            print(f"  {tag:14s} rel_mean={m['rel_mean']:.3f} "
                  f"rel_cov={m['rel_cov']:.3f} sw1={m['sw1']:.3f}")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)
        print("wrote", args.json)


if __name__ == "__main__":
    main()

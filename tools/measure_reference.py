"""Measure the ACTUAL reference implementation end-to-end (torch CPU).

BASELINE.md's plan requires the reference baseline to be *measured, not
quoted* (the reference publishes no numbers — ``BASELINE.json``
``"published": {}``). This drives ``/root/reference/optex.py``'s own
``OptimalTexture.forward`` (optex.py:81-139) on the BASELINE.json configs
that run on CPU, with two honest adjustments:

* torchvision/kornia are absent in this environment, so their top-level
  imports are satisfied by stubs — but unlike the test-harness stubs, the
  pieces an end-to-end run actually executes are REAL: ``to_tensor`` is the
  standard PIL->tensor conversion and ``Image.ANTIALIAS`` maps to LANCZOS on
  Pillow>=10 (the reference requires Pillow<10, util.py:29).
* the depth-4/5 checkpoints are missing from the reference snapshot itself
  (``.MISSING_LARGE_BLOBS``), so the encoder/decoder banks are truncated to
  depth 3 — the ModuleLists become [Encoder(3..1)], which makes the layer
  loop consume schedule columns [l-1 for l in 0..2] = [4, 0, 1], EXACTLY the
  columns our depth-3 Synthesizer consumes (utils/schedule.py quirk=True,
  num_layers=3). Same workload, both sides.

Outputs one JSON line per config with wall seconds (best of --runs) and the
reference's sliced-OT iterations/sec at the relu3_1 shape (the BASELINE.json
second metric), measured with the reference's own ``optimal_transport``
(host scipy rotation per iteration included — that cost is part of the
reference's design, SURVEY §3.1).

Usage: python tools/measure_reference.py [--configs 1 3] [--runs 2]
       [--json docs/reference_baseline_cpu.json]
"""

import argparse
import json
import os
import sys
import time
import types

import numpy as np

REF = "/root/reference"


def install_runtime_stubs():
    """Satisfy the reference's torchvision/kornia imports with WORKING
    implementations of everything an e2e synthesis/mixing run touches."""
    import torch
    from PIL import Image

    if not hasattr(Image, "ANTIALIAS"):  # Pillow>=10 removed the alias
        Image.ANTIALIAS = Image.LANCZOS

    def to_tensor(img):
        arr = np.asarray(img, dtype=np.float32) / 255.0
        return torch.from_numpy(arr).permute(2, 0, 1).contiguous()

    names = ["torchvision", "torchvision.transforms",
             "torchvision.transforms.functional", "torchvision.utils"]
    for n in names:
        sys.modules.setdefault(n, types.ModuleType(n))
    tv = sys.modules["torchvision"]
    tv.transforms = sys.modules["torchvision.transforms"]
    tv.transforms.functional = sys.modules["torchvision.transforms.functional"]
    tv.transforms.functional.to_tensor = to_tensor
    tv.utils = sys.modules["torchvision.utils"]
    tv.utils.save_image = lambda out, path: None  # measurement: don't write

    # WORKING torch port of kornia's HLS conversions (NCHW, H in radians,
    # L/S in [0,1] — the same colorsys-equivalent formulas as
    # optimaltextures_tpu/ops/colors.py, which are colorsys-tested), so the
    # color-transfer configs 4 and 5 measure end-to-end instead of raising
    # (VERDICT r3 next-step #3; reference call sites optex.py:124-138).
    two_pi = 2.0 * np.pi

    def rgb_to_hls(image):
        r, g, b = image[:, 0], image[:, 1], image[:, 2]
        maxc = torch.maximum(torch.maximum(r, g), b)
        minc = torch.minimum(torch.minimum(r, g), b)
        l = (maxc + minc) / 2.0
        delta = maxc - minc
        denom = (1.0 - (2.0 * l - 1.0).abs()).clamp_min(1e-8)
        s = torch.where(delta > 0, delta / denom, torch.zeros_like(delta))
        safe = torch.where(delta > 0, delta, torch.ones_like(delta))
        rc, gc, bc = (maxc - r) / safe, (maxc - g) / safe, (maxc - b) / safe
        h = torch.where(maxc == r, bc - gc,
                        torch.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
        h = torch.where(delta > 0, (h / 6.0) % 1.0,
                        torch.zeros_like(h)) * two_pi
        return torch.stack([h, l, s], dim=1)

    def hls_to_rgb(hls):
        h = (hls[:, 0] / two_pi) % 1.0
        l, s = hls[:, 1], hls[:, 2]
        m2 = torch.where(l <= 0.5, l * (1.0 + s), l + s - l * s)
        m1 = 2.0 * l - m2

        def channel(hue):
            hue = hue % 1.0
            return torch.where(
                hue < 1.0 / 6.0, m1 + (m2 - m1) * hue * 6.0,
                torch.where(hue < 0.5, m2,
                            torch.where(hue < 2.0 / 3.0,
                                        m1 + (m2 - m1) * (2.0 / 3.0 - hue) * 6.0,
                                        m1)))

        return torch.stack([channel(h + 1.0 / 3.0), channel(h),
                            channel(h - 1.0 / 3.0)], dim=1)

    k = types.ModuleType("kornia")
    kc = types.ModuleType("kornia.color")
    kh = types.ModuleType("kornia.color.hls")
    kh.rgb_to_hls = rgb_to_hls
    kh.hls_to_rgb = hls_to_rgb
    kc.hls = kh
    k.color = kc
    for n, m in [("kornia", k), ("kornia.color", kc),
                 ("kornia.color.hls", kh)]:
        sys.modules.setdefault(n, m)


def build_model(ref_optex, ref_vgg, size, iters, passes, hist_mode, **kw):
    """OptimalTexture with the bank truncated to the available depth 3."""
    import torch

    model = ref_optex.OptimalTexture.__new__(ref_optex.OptimalTexture)
    torch.nn.Module.__init__(model)
    model.hist_mode = hist_mode
    model.color_transfer = kw.get("color_transfer")
    model.content_strength = kw.get("content_strength", 0.1)
    model.style_scale = kw.get("style_scale", 1.0)
    model.mixing_alpha = kw.get("mixing_alpha", 0.5)
    model.use_pca = not kw.get("no_pca", False)
    model.passes = passes
    model.iters_per_pass_and_layer, model.sizes = \
        ref_optex.get_iters_and_sizes(size, iters, passes,
                                      not kw.get("no_multires", False))
    model.encoders = torch.nn.ModuleList(
        [ref_vgg.Encoder(d) for d in range(3, 0, -1)])
    model.decoders = torch.nn.ModuleList(
        [ref_vgg.Decoder(d) for d in range(3, 0, -1)])
    return model


def measure_ot_iters_per_sec(ref_optex, size):
    """Reference optimal_transport at the relu3_1 shape (chol, C=256),
    including its per-iteration host scipy rotation (optex.py:148-149)."""
    import torch

    torch.manual_seed(0)
    h = w = size // 4
    feat = (torch.randn(1, h, w, 256) ** 2)
    style = (torch.randn(1, h, w, 256) ** 2)
    n_iters = 32
    with torch.inference_mode():
        for _ in range(2):  # warm caches
            ref_optex.optimal_transport(feat, style, "chol")
        t0 = time.time()
        x = feat
        for _ in range(n_iters):
            x = ref_optex.optimal_transport(x, style, "chol")
        wall = time.time() - t0
    return n_iters / wall


CONFIGS = {
    1: dict(name="synthesis_256", size=256,
            style=[f"{REF}/style/graffiti.jpg"], content=None,
            kw={}),
    2: dict(name="transfer_512", size=512,
            style=[f"{REF}/style/lava-small.jpg"],
            content=f"{REF}/content/rocket.jpg",
            kw=dict(content_strength=0.2)),
    3: dict(name="mixing_512", size=512,
            style=[f"{REF}/style/zebra.jpg", f"{REF}/style/pattern-small.jpg"],
            content=None, kw=dict(mixing_alpha=0.5)),
    4: dict(name="color_opt_1024", size=1024,
            style=[f"{REF}/style/green-paint-large.jpg"],
            content=f"{REF}/content/city.jpg",
            kw=dict(color_transfer="opt")),
    5: dict(name="highres_2048_lum", size=2048,
            style=[f"{REF}/style/green-paint-large.jpg"],
            content=f"{REF}/content/city.jpg",
            kw=dict(style_scale=0.5, color_transfer="lum")),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=int, nargs="+", default=[1])
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    install_runtime_stubs()
    sys.path.insert(0, REF)
    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    import optex as ref_optex  # noqa: E402
    import util as ref_util  # noqa: E402
    import vgg as ref_vgg  # noqa: E402

    results = {"device": "cpu", "torch": torch.__version__,
               "cpu_count": os.cpu_count(), "depth": 3,
               "note": ("reference truncated to its available depth-3 "
                        "checkpoints; schedule columns consumed = [4,0,1], "
                        "identical to our depth-3 run"),
               "configs": {}}

    for cid in args.configs:
        spec = CONFIGS[cid]
        torch.manual_seed(0)
        styles = ref_util.load_styles(spec["style"], spec["size"],
                                      spec["kw"].get("style_scale", 1.0))
        content = ref_util.maybe_load_content(spec.get("content"),
                                              spec["size"])
        model = build_model(ref_optex, ref_vgg, spec["size"], args.iters,
                            args.passes, "chol", **spec["kw"])
        walls = []
        with torch.inference_mode():
            for r in range(args.runs):
                # content runs take the content's shape (optex.py:263)
                pastiche = (torch.rand(content.shape) if content is not None
                            else torch.rand(1, 3, spec["size"], spec["size"]))
                t0 = time.time()
                out = model.forward(pastiche, styles, content)
                walls.append(time.time() - t0)
                print(f"config {cid} run {r}: {walls[-1]:.2f} s "
                      f"(out {tuple(out.shape)})", flush=True)
        results["configs"][spec["name"]] = {
            "wall_seconds_best": round(min(walls), 2),
            "wall_seconds_all": [round(w, 2) for w in walls],
            "iters": args.iters, "passes": args.passes,
        }

    results["ot_iters_per_sec_relu3_1_cpu_256"] = round(
        measure_ot_iters_per_sec(ref_optex, 256), 2)

    line = json.dumps(results)
    print(line)
    if args.json:
        with open(args.json, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()

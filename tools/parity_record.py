"""Full-default-scale parity run of record (VERDICT r4 #5).

The integration A/Bs in tests/test_reference_parity_ext.py certify the
composition at 64-96px with 1-4 iterations/layer; SURVEY §4(c)'s contract is
output parity at the ADVERTISED scale. This tool runs the reference's own
``OptimalTexture.forward`` (optex.py:81-139, bank truncated to its available
depth-3 checkpoints exactly as tools/measure_reference.py does) against our
``Synthesizer.run`` at the config of record — 512px, 5 passes, iters=500
(= 493 consumed through the [l-1] quirk, optex.py:112) — with BOTH sides
consuming the SAME injected rotation stream, on torch/jax CPU:

* ``chol`` (the parity default): float-tolerance assertion on the output
  pixels (the BASELINE.json contract);
* ``cdf``: distributional bands (per-channel 1-D Wasserstein + moments) —
  cdf is chaotic at pass granularity (the reference diverges from ITSELF
  under epsilon input perturbations; see test_full_pass_integration's
  rationale), so pixel tolerance is not a meaningful contract for it.

``no_pca`` on both sides: torch.svd and our eigh agree on the PCA subspace
but not the basis coordinates (column signs/rotations within eigenspaces),
so a shared rotation stream only has shared meaning at full channel width.
PCA-path parity is covered per-op (test_fit_pca_vs_reference: same k, same
projector) and statistically (quality gates).

Writes docs/parity_record_r5.json. Run on an IDLE host (CPU walls).

Usage: python tools/parity_record.py [--size 512] [--iters 500]
         [--modes chol cdf] [--cdf_size 256] [--json docs/parity_record_r5.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

# jax on CPU, tunnel env stripped (CLAUDE.md: never attach jax to the TPU
# from a CPU tool)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

from measure_reference import build_model, install_runtime_stubs  # noqa: E402

REF = "/root/reference"


def rotation_stream(iters_table, widths=(256, 128, 64), seed=0):
    """One SO(w) stack per (pass, layer), scipy-sampled, shared verbatim by
    both sides. Returns ({(p, l): (n, w, w) f32}, total_iters)."""
    from scipy.stats import special_ortho_group

    stream, total = {}, 0
    for p, row in enumerate(iters_table):
        for l, w in enumerate(widths):
            n = int(row[l])
            total += n
            stream[(p, l)] = np.stack([
                special_ortho_group.rvs(
                    w, random_state=seed + 100000 * p + 1000 * l + i)
                for i in range(n)]).astype(np.float32) if n else \
                np.zeros((0, w, w), np.float32)
    return stream, total


def run_reference(mode, size, iters, passes, style_nhwc, noise_nhwc, stream):
    import torch

    sys.path.insert(0, REF)
    import optex as ref_optex
    import vgg as ref_vgg

    queue = [r for p in range(passes) for l in range(3)
             for r in stream[(p, l)]]
    ref_optex.random_rotation = \
        lambda n, device="cpu", impl="scipy": torch.from_numpy(queue.pop(0))

    model = build_model(ref_optex, ref_vgg, size, iters, passes, mode,
                        no_pca=True)
    styles = [torch.from_numpy(np.asarray(style_nhwc).transpose(0, 3, 1, 2))]
    pastiche = torch.from_numpy(np.asarray(noise_nhwc).transpose(0, 3, 1, 2))
    t0 = time.time()
    with torch.inference_mode():
        out = model.forward(pastiche, styles, None)
    wall = time.time() - t0
    assert not queue, f"{len(queue)} rotations unconsumed by the reference"
    return out.numpy().transpose(0, 2, 3, 1), wall


def run_ours(mode, size, iters, passes, style_nhwc, noise_nhwc, stream):
    import jax
    import jax.numpy as jnp

    from optimaltextures_tpu import core, transport
    from optimaltextures_tpu.config import OptexConfig

    order = [(p, l) for p in range(passes) for l in range(3)]
    call_idx = [0]
    real = transport.stage_rotations

    def fake_stage_rotations(key, n_iters, n):
        p, l = order[call_idx[0]]
        call_idx[0] += 1
        rots = stream[(p, l)]
        assert rots.shape == (n_iters, n, n), (p, l, rots.shape, n_iters, n)
        return jnp.asarray(rots)

    transport.stage_rotations = fake_stage_rotations
    try:
        cfg = OptexConfig(size=size, passes=passes, iters=iters, depth=3,
                          seed=0, no_pca=True, hist_mode=mode,
                          style=["graffiti.jpg"])
        synth = core.Synthesizer(cfg)
        t0 = time.time()
        out = synth.run(jnp.asarray(np.asarray(noise_nhwc)),
                        [jnp.asarray(np.asarray(style_nhwc))])
        out = np.asarray(out)
        wall = time.time() - t0
        assert call_idx[0] == len(order), (call_idx[0], len(order))
    finally:
        transport.stage_rotations = real
        # drop the constant-embedded injected-trace programs
        core._run_stages_jit.clear_cache()
        core._run_stages_jit_nodonate.clear_cache()
    return out, wall


def compare(mode, ref, got):
    d = np.abs(ref - got)
    rep = {"max_abs_err": float(d.max()), "mean_abs_err": float(d.mean()),
           "p99_abs_err": float(np.percentile(d, 99)),
           "ref_mean": float(ref.mean()), "got_mean": float(got.mean()),
           "ref_std": float(ref.std()), "got_std": float(got.std())}
    w1 = [float(np.abs(np.sort(got[..., c].ravel())
                       - np.sort(ref[..., c].ravel())).mean())
          for c in range(3)]
    rep["w1_per_channel"] = w1
    if mode == "chol":
        # float-tolerance contract at full scale: 25 chained conv stacks +
        # 493 f32 OT iterations accumulate backend-order drift; the gate is
        # the per-pixel band the 2-pass integration test scales to
        rep["gate"] = {"mean_abs_err<": 2e-3, "p99_abs_err<": 2e-2}
        rep["pass"] = bool(rep["mean_abs_err"] < 2e-3
                           and rep["p99_abs_err"] < 2e-2)
    else:
        rep["gate"] = {"w1<": 0.02, "|dmean|<": 0.02, "|dstd|<": 0.02}
        rep["pass"] = bool(max(w1) < 0.02
                           and abs(rep["ref_mean"] - rep["got_mean"]) < 0.02
                           and abs(rep["ref_std"] - rep["got_std"]) < 0.02)
    return rep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--modes", nargs="+", default=["chol", "cdf"])
    ap.add_argument("--cdf_size", type=int, default=256,
                    help="cdf runs at this size (the reference's per-channel "
                         "python histc loop is minutes-scale at 512)")
    ap.add_argument("--json", default="docs/parity_record_r5.json")
    args = ap.parse_args()

    install_runtime_stubs()
    from optimaltextures_tpu.utils import imageio, schedule

    results = {"config_of_record": {
        "size": args.size, "iters": args.iters, "passes": args.passes,
        "depth": 3, "no_pca": True,
        "consumed_iters": None}, "modes": {}}

    for mode in args.modes:
        size = args.size if mode == "chol" else args.cdf_size
        table, sizes = schedule.iters_and_sizes(
            size, args.iters, args.passes, True, quirk=True, num_layers=3)
        stream, total = rotation_stream(table)
        results["config_of_record"]["consumed_iters"] = total
        style = imageio.load_image(f"{REF}/style/graffiti.jpg", size,
                                   oversize=False)
        noise = np.random.default_rng(0).uniform(
            size=(1, size, size, 3)).astype(np.float32)

        print(f"[{mode}] reference forward @ {size}px, {total} iters ...",
              flush=True)
        ref_out, ref_wall = run_reference(mode, size, args.iters, args.passes,
                                          style, noise, stream)
        print(f"[{mode}] reference: {ref_wall:.1f} s; ours ...", flush=True)
        got_out, our_wall = run_ours(mode, size, args.iters, args.passes,
                                     style, noise, stream)
        rep = compare(mode, ref_out, got_out)
        rep.update({"size": size, "total_iters": total,
                    "ref_wall_s": round(ref_wall, 1),
                    "ours_cpu_wall_s": round(our_wall, 1)})
        results["modes"][mode] = rep
        print(f"[{mode}] {json.dumps(rep)}", flush=True)

    line = json.dumps(results)
    print(line)
    with open(args.json, "w") as f:
        f.write(line + "\n")
    if not all(m["pass"] for m in results["modes"].values()):
        sys.exit(1)


if __name__ == "__main__":
    main()

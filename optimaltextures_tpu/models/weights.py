"""Checkpoint conversion and loading.

The reference ships torch ``.pth`` state dicts keyed by flat Sequential index
with OIHW conv weights (``/root/reference/vgg.py:144,162``; verified key
layout e.g. ``0.weight (3,3,1,1)``, ``2.weight (64,3,3,3)``). A TPU pipeline
wants HWIO weights in plain ``.npz`` archives loadable without torch. The
one-time conversion (:func:`convert_pth`) requires torch; the runtime loader
(:func:`load_params`) requires only numpy.

Only depths 1-3 checkpoints exist in this snapshot — the depth-4/5 pairs
(``vgg_normalised_conv{4,5}_1.pth``, ``feature_invertor_conv{4,5}_1.pth``)
are absent upstream. :func:`available_depths` reports what is usable and the
pipeline degrades gracefully to the deepest available layer. To restore full
5-depth fidelity, obtain the two missing pairs from the deep-transfer / WCT
release lineage and run ``python -m tools.convert_weights <dir>``.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

from . import arch

# Default location of converted weights: <repo>/weights/*.npz
_DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "weights")

ENCODER_NPZ = "vgg_normalised_conv{d}_1.npz"
DECODER_NPZ = "feature_invertor_conv{d}_1.npz"

# A conv's params: weight HWIO float32, bias (cout,) float32.
ConvParams = Tuple[np.ndarray, np.ndarray]
Params = List[ConvParams]


def weights_dir() -> str:
    return os.environ.get("OPTEX_WEIGHTS_DIR", os.path.abspath(_DEFAULT_DIR))


def available_depths(directory: str | None = None) -> List[int]:
    """Depths d for which BOTH the encoder and decoder npz exist."""
    d = directory or weights_dir()
    out = []
    for depth in range(1, 6):
        enc = os.path.join(d, ENCODER_NPZ.format(d=depth))
        dec = os.path.join(d, DECODER_NPZ.format(d=depth))
        if os.path.exists(enc) and os.path.exists(dec):
            out.append(depth)
    return out


def max_depth(directory: str | None = None) -> int:
    depths = available_depths(directory)
    if not depths:
        raise FileNotFoundError(
            f"no converted VGG weights found in {directory or weights_dir()}; "
            "run `python -m tools.convert_weights`"
        )
    return max(depths)


def _npz_params(path: str) -> Params:
    with np.load(path) as z:
        n = int(z["num_convs"])
        return [
            (z[f"conv{i}_w"].astype(np.float32), z[f"conv{i}_b"].astype(np.float32))
            for i in range(n)
        ]


def load_encoder_params(depth: int, directory: str | None = None) -> Params:
    path = os.path.join(directory or weights_dir(), ENCODER_NPZ.format(d=depth))
    params = _npz_params(path)
    _check(params, arch.encoder_specs(depth), f"encoder depth {depth}")
    return params


def load_decoder_params(depth: int, directory: str | None = None) -> Params:
    path = os.path.join(directory or weights_dir(), DECODER_NPZ.format(d=depth))
    params = _npz_params(path)
    _check(params, arch.decoder_specs(depth), f"decoder depth {depth}")
    return params


def _check(params: Params, specs, what: str) -> None:
    if len(params) != len(specs):
        raise ValueError(f"{what}: expected {len(specs)} convs, npz has {len(params)}")
    for i, ((w, b), (cin, cout, k, _, _)) in enumerate(zip(params, specs)):
        if w.shape != (k, k, cin, cout):
            raise ValueError(f"{what} conv{i}: weight {w.shape} != {(k, k, cin, cout)}")
        if b.shape != (cout,):
            raise ValueError(f"{what} conv{i}: bias {b.shape} != {(cout,)}")


# ----------------------------------------------------------------------------
# Orbax export/import: the framework-native checkpoint format (the reference
# only ever READS torch state dicts, vgg.py:144,162; orbax gives atomic,
# versioned, asynchronously-writable checkpoints for serving fleets).


def save_orbax(directory: str, out_path: str) -> str:
    """Export every converted npz in `directory` as ONE orbax checkpoint."""
    import orbax.checkpoint as ocp

    tree = {}
    for depth in available_depths(directory):
        tree[f"encoder_{depth}"] = [
            {"w": w, "b": b} for w, b in load_encoder_params(depth, directory)]
        tree[f"decoder_{depth}"] = [
            {"w": w, "b": b} for w, b in load_decoder_params(depth, directory)]
    if not tree:
        raise FileNotFoundError(f"no converted weights in {directory or weights_dir()}")
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(out_path), tree)
    return out_path


def load_orbax(path: str) -> Dict[int, Dict[str, Params]]:
    """Load an orbax checkpoint back into {depth: {"encoder": Params,
    "decoder": Params}}."""
    import orbax.checkpoint as ocp

    tree = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    out: Dict[int, Dict[str, Params]] = {}
    for key, convs in tree.items():
        kind, depth_s = key.rsplit("_", 1)
        depth = int(depth_s)
        params = [(np.asarray(c["w"]), np.asarray(c["b"])) for c in convs]
        out.setdefault(depth, {})[kind] = params
    for depth, banks in out.items():
        _check(banks["encoder"], arch.encoder_specs(depth), f"encoder depth {depth}")
        _check(banks["decoder"], arch.decoder_specs(depth), f"decoder depth {depth}")
    return out


# ----------------------------------------------------------------------------
# One-time conversion (torch needed).


def convert_pth(pth_path: str, specs, out_path: str) -> None:
    """Convert one reference ``.pth`` state dict to an ``.npz`` archive.

    Keys are looked up by the reconstructed flat Sequential index
    (:func:`arch.torch_sequential_indices`); weights transposed OIHW->HWIO.
    """
    import torch  # local import: runtime never needs torch

    sd = torch.load(pth_path, map_location="cpu")
    idxs = arch.torch_sequential_indices(specs)
    out: Dict[str, np.ndarray] = {"num_convs": np.array(len(specs))}
    for i, (si, (cin, cout, k, _, _)) in enumerate(zip(idxs, specs)):
        w = sd[f"{si}.weight"].numpy()
        b = sd[f"{si}.bias"].numpy()
        assert w.shape == (cout, cin, k, k), (w.shape, (cout, cin, k, k))
        out[f"conv{i}_w"] = np.ascontiguousarray(w.transpose(2, 3, 1, 0))  # OIHW->HWIO
        out[f"conv{i}_b"] = b
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez(out_path, **out)


def convert_all(reference_models_dir: str, out_dir: str | None = None) -> List[str]:
    """Convert every encoder/decoder checkpoint present in a reference dir."""
    out_dir = out_dir or weights_dir()
    written = []
    for depth in range(1, 6):
        for pth_name, npz_name, specs in (
            (f"vgg_normalised_conv{depth}_1.pth", ENCODER_NPZ.format(d=depth),
             arch.encoder_specs(depth)),
            (f"feature_invertor_conv{depth}_1.pth", DECODER_NPZ.format(d=depth),
             arch.decoder_specs(depth)),
        ):
            src = os.path.join(reference_models_dir, pth_name)
            if not os.path.exists(src):
                continue
            dst = os.path.join(out_dir, npz_name)
            convert_pth(src, specs, dst)
            written.append(dst)
    return written

"""Functional NHWC VGG-19 encoder / feature-inverter forward passes.

Replaces the reference's torch Sequential stacks (``/root/reference/vgg.py``)
with a pure function over a params pytree, driven by the spec tables in
:mod:`optimaltextures_tpu.models.arch`. Both directions are NHWC end to end:
images enter as (N, H, W, 3) float in [0, 1] and features come out
(N, H/2^{d-1}, W/2^{d-1}, C_d) — the reference's post-hoc NCHW->NHWC permute
(``vgg.py:152-153``) disappears because the layout is native here.

``encode``/``decode`` are plain jittable functions; the caller decides the
jit boundaries (the core loop fuses decode+encode into its per-layer stage).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.convops import (conv2d_nhwc, maxpool_2x2_ceil, pad_spatial,
                           reflect_pad, upsample_nearest_2x)
from . import arch, weights


def _run_stack(params, specs, x: jnp.ndarray,
               pad_mode: str = "reflect") -> jnp.ndarray:
    for (w, b), (_, _, k, pre, post) in zip(params, specs):
        if pre == "pool":
            x = maxpool_2x2_ceil(x)
        elif pre == "up":
            x = upsample_nearest_2x(x)
        if k == 3:
            x = pad_spatial(x, 1, pad_mode)
        x = conv2d_nhwc(x, w, b)
        if post == "relu":
            x = jax.nn.relu(x)
    return x


def encode(params, depth: int, image: jnp.ndarray,
           pad_mode: str = "reflect") -> jnp.ndarray:
    """NHWC image -> relu{depth}_1 NHWC features.

    ``pad_mode="wrap"`` replaces the reference's reflection padding with
    circular padding (tileable synthesis, an extension — see
    ``ops.convops.circular_pad``)."""
    return _run_stack(params, arch.encoder_specs(depth), image, pad_mode)


def encode_taps(params, depth: int, image: jnp.ndarray):
    """NHWC image -> [relu1_1, ..., relu{depth}_1] in ONE forward pass.

    The depth-d encoder computes every shallower relu{i}_1 as an
    intermediate; tapping them halves the style/content encoding work vs
    running d separate truncated encoders (which is what the reference does,
    optex.py:62-63 — one Encoder per depth, shared prefixes recomputed).
    ``params`` must be the depth-``depth`` encoder parameters.
    """
    specs = arch.encoder_specs(depth)
    tap_after = {arch._ENCODER_LEN[d] - 1: d for d in range(1, depth + 1)}
    taps = []
    x = image
    for i, ((w, b), (_, _, k, pre, post)) in enumerate(zip(params, specs)):
        if pre == "pool":
            x = maxpool_2x2_ceil(x)
        if k == 3:
            x = reflect_pad(x, 1)
        x = conv2d_nhwc(x, w, b)
        if post == "relu":
            x = jax.nn.relu(x)
        if i in tap_after:
            taps.append(x)
    return taps


def decode(params, depth: int, feature: jnp.ndarray,
           pad_mode: str = "reflect") -> jnp.ndarray:
    """relu{depth}_1 NHWC features -> NHWC image (unclamped, like the
    reference's final conv with no activation, ``vgg.py:130-134``)."""
    return _run_stack(params, arch.decoder_specs(depth), feature, pad_mode)


class VGGBank:
    """Loads and holds encoder/decoder params for depths 1..max_depth.

    Thin host-side container — the forward passes stay pure functions so jit
    closures capture only array pytrees.
    """

    def __init__(self, max_depth: Optional[int] = None, directory: Optional[str] = None,
                 dtype=jnp.float32):
        avail = weights.available_depths(directory)
        if not avail:
            raise FileNotFoundError(
                "no converted VGG weights found — convert the reference "
                ".pth checkpoints with `python -m tools.convert_weights` "
                "and/or point OPTEX_WEIGHTS_DIR at a directory holding "
                "vgg_normalised_conv{d}_1.npz / feature_invertor_conv{d}_1"
                ".npz (required for installed packages, which do not "
                "bundle the weights)")
        self.max_depth = max_depth or max(avail)
        if self.max_depth not in avail:
            raise ValueError(f"depth {self.max_depth} unavailable; have {avail}")
        cast = lambda ps: [(jnp.asarray(w, dtype), jnp.asarray(b, dtype)) for w, b in ps]
        self.enc_params = {d: cast(weights.load_encoder_params(d, directory))
                           for d in range(1, self.max_depth + 1)}
        self.dec_params = {d: cast(weights.load_decoder_params(d, directory))
                           for d in range(1, self.max_depth + 1)}

    def encode_fn(self, depth: int):
        return partial(encode, self.enc_params[depth], depth)

    def decode_fn(self, depth: int):
        return partial(decode, self.dec_params[depth], depth)


def synthetic_bank(max_depth: int = 5, dtype=jnp.float32,
                   seed: int = 0) -> VGGBank:
    """A VGGBank with He-scaled random weights for every depth 1..max_depth.

    FLOP- and shape-identical to a real bank (same spec tables), so it
    measures the TRUE cost of workloads whose checkpoints are missing from
    the reference snapshot (the conv4/5 pairs, ``.MISSING_LARGE_BLOBS``).
    Outputs are meaningless as textures — this exists for benchmarking and
    architecture validation only; converted real weights drop in unchanged.
    """
    import numpy as np

    rng = np.random.default_rng(seed)

    def params_for(specs):
        # He scaling keeps post-ReLU activation variance ~stable through the
        # stack, so deep synthetic runs neither collapse to zero nor overflow
        # (timing with denormal/inf tensors would not be representative)
        return [(jnp.asarray(rng.normal(
                    0.0, np.sqrt(2.0 / (k * k * cin)),
                    (k, k, cin, cout)).astype(np.float32), dtype),
                 jnp.zeros((cout,), dtype))
                for (cin, cout, k, _, _) in specs]

    bank = VGGBank.__new__(VGGBank)
    bank.max_depth = max_depth
    bank.enc_params = {d: params_for(arch.encoder_specs(d))
                       for d in range(1, max_depth + 1)}
    bank.dec_params = {d: params_for(arch.decoder_specs(d))
                       for d in range(1, max_depth + 1)}
    return bank

"""TPU-friendly conv building blocks: reflection pad, ceil-mode max-pool,
nearest x2 upsample, and the NHWC conv wrapper.

These replace the reference's ``ReflectionPad2d`` / ``MaxPool2d(ceil_mode)`` /
``UpsamplingNearest2d`` torch modules (``/root/reference/vgg.py:14-135``) with
XLA primitives. Everything is NHWC: TPU convs are natively channel-last, and
the downstream optimal-transport phase wants channel-last features anyway
(the reference itself converts to NHWC after encoding, ``vgg.py:152-153``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def reflect_pad(x: jnp.ndarray, pad: int = 1) -> jnp.ndarray:
    """Reflection-pad the two spatial dims of an NHWC tensor."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def circular_pad(x: jnp.ndarray, pad: int = 1) -> jnp.ndarray:
    """Circular (wrap) padding of the two spatial dims of an NHWC tensor.

    Extension beyond the reference: swapping the conv stacks'
    ``ReflectionPad2d`` (``/root/reference/vgg.py:14-135``) for wrap padding
    makes the whole encode/decode pipeline translation-equivariant on the
    torus, so synthesized textures tile seamlessly (``OptexConfig.tileable``).
    """
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="wrap")


def pad_spatial(x: jnp.ndarray, pad: int, mode: str) -> jnp.ndarray:
    """``reflect`` (reference semantics) or ``wrap`` (tileable) padding."""
    if mode == "reflect":
        return reflect_pad(x, pad)
    if mode == "wrap":
        return circular_pad(x, pad)
    raise ValueError(f"pad mode must be reflect|wrap, got {mode!r}")


def conv2d_nhwc(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """VALID 2-D conv, NHWC activations, HWIO weights, stride 1."""
    # float32 activations use full-precision MXU passes (TPU otherwise
    # defaults to bf16 inputs, which breaks reference parity); bfloat16
    # activations keep the fast path.
    precision = lax.Precision.HIGHEST if x.dtype == jnp.float32 else lax.Precision.DEFAULT
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    return y + b.astype(y.dtype)


def maxpool_2x2_ceil(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 max pool with ceil_mode=True semantics.

    torch's ceil_mode pads the bottom/right so that the output covers
    ceil(H/2) x ceil(W/2); padding participates as -inf (never wins the max).
    On the reference's round-32 sizes H,W are always even, but odd sizes can
    occur for arbitrary inputs, so implement it properly.
    """
    _, h, w, _ = x.shape
    pad_h = (-h) % 2
    pad_w = (-w) % 2
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
    )


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour x2 upsample of NHWC (exact torch semantics)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)

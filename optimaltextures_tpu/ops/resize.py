"""Image resizing as two GEMMs.

The reference resizes tensors with ``F.interpolate(mode="bicubic",
align_corners=False, antialias=True)`` (``/root/reference/util.py:105-106``).
Instead of translating that gather-based kernel, each separable 1-D
resampling becomes a dense (out, in) weight matrix applied as a matmul —
which is exactly what the TPU MXU wants, and gives bit-level control of the
kernel so torch parity holds (torch aa-bicubic uses A=-0.5; ``jax.image.resize``
uses A=-0.5 and different edge handling, so it cannot be used for parity).

Weights replicate torch's antialiased separable algorithm
(aten/src/ATen/native/UpSample.h: center = (i+0.5)*scale - 0.5, support
scaled by max(1, scale), boundary taps renormalized). For upscales the same
algorithm degenerates to standard bicubic, so one code path covers both.
Matrices are built host-side in float64 and cached; the device work is two
``jnp.einsum`` contractions.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _bicubic_kernel(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    # A = -0.5: aten's ANTIALIASED bicubic uses the PIL/Keys parameter (the
    # non-aa torch path uses -0.75, but the reference always resizes with
    # antialias=True, util.py:105-106 — verified against torch directly).
    ax = np.abs(x)
    w = np.where(
        ax <= 1.0,
        ((a + 2.0) * ax - (a + 3.0)) * ax * ax + 1.0,
        np.where(ax < 2.0, (((ax - 5.0) * ax + 8.0) * ax - 4.0) * a, 0.0),
    )
    return w


@lru_cache(maxsize=256)
def resample_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) float32 bicubic-antialias resampling matrix."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    scale = in_size / out_size
    support = 2.0 * scale if scale > 1.0 else 2.0
    invscale = 1.0 / scale if scale > 1.0 else 1.0

    # aten convention (UpSampleKernel.cpp _compute_weights_aa): center has no
    # -0.5 shift; the +0.5 is folded into the weight argument instead, and the
    # tap window is truncated-toward-zero around it.
    i = np.arange(out_size, dtype=np.float64)
    center = (i + 0.5) * scale
    xmin = np.maximum(0, (center - support + 0.5).astype(np.int64))
    xmax = np.minimum(in_size, (center + support + 0.5).astype(np.int64))

    W = np.zeros((out_size, in_size), dtype=np.float64)
    for o in range(out_size):
        j = np.arange(xmin[o], xmax[o])
        w = _bicubic_kernel((j - center[o] + 0.5) * invscale)
        s = w.sum()
        if s != 0.0:
            w = w / s
        W[o, j] = w
    return W.astype(np.float32)


@lru_cache(maxsize=256)
def resample_matrix_circular(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) bicubic-antialias resampling matrix on the circle.

    Same kernel/tap convention as :func:`resample_matrix`, but taps that fall
    outside [0, in_size) wrap around instead of being truncated+renormalized
    at the border — every output sees the full kernel support, so resampling
    commutes with circular shifts (used by tileable synthesis for the
    multires pastiche upsample; an extension beyond the reference's
    ``F.interpolate``, ``/root/reference/util.py:105-106``)."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    scale = in_size / out_size
    support = 2.0 * scale if scale > 1.0 else 2.0
    invscale = 1.0 / scale if scale > 1.0 else 1.0

    i = np.arange(out_size, dtype=np.float64)
    center = (i + 0.5) * scale
    # floor, NOT the int cast of the border-truncated variant: windows near
    # o=0 start at negative taps, and truncation toward zero would give those
    # rows a different window length than interior rows — breaking the
    # row-shift structure that makes resampling commute with rolls
    xmin = np.floor(center - support + 0.5).astype(np.int64)
    xmax = np.floor(center + support + 0.5).astype(np.int64)

    W = np.zeros((out_size, in_size), dtype=np.float64)
    for o in range(out_size):
        j = np.arange(xmin[o], xmax[o])
        w = _bicubic_kernel((j - center[o] + 0.5) * invscale)
        s = w.sum()
        if s != 0.0:
            w = w / s
        np.add.at(W[o], j % in_size, w)
    return W.astype(np.float32)


def apply_resample(x: jnp.ndarray, wh: jnp.ndarray,
                   ww: jnp.ndarray) -> jnp.ndarray:
    """The two resampling contractions with the weights as ARGUMENTS.

    Traced callers must use this form for large sizes: ``resize_nhwc``
    builds the (out, in) matrices inside the trace, which bakes them into
    the program as HLO constants — an 8192-wide multires chain embeds
    ~0.5 GB of constants, which broke the remote-compile transport
    outright (r4). Weight arrays passed as runtime parameters keep the
    program small and upload once (see core's device cache)."""
    # (N,H,W,C): contract H then W; both land on the MXU.
    y = jnp.einsum("oh,nhwc->nowc", wh, x, precision="highest")
    return jnp.einsum("ow,nhwc->nhoc", ww, y, precision="highest")


def resample_pair(in_hw: Tuple[int, int], out_hw: Tuple[int, int],
                  circular: bool = False):
    """Host (wh, ww) float32 matrices for an (H, W) -> (H, W) resize."""
    mat = resample_matrix_circular if circular else resample_matrix
    return mat(in_hw[0], out_hw[0]), mat(in_hw[1], out_hw[1])


def resize_nhwc(x: jnp.ndarray, size: Tuple[int, int],
                circular: bool = False) -> jnp.ndarray:
    """Bicubic+antialias resize of NHWC to (H, W), torch-parity semantics.

    ``circular=True`` wraps out-of-range kernel taps instead of truncating
    them at the border (shift-equivariant on the torus; tileable mode).
    NOTE: under trace the weights become program constants — fine at small
    sizes, use :func:`apply_resample` with cached weight arguments for
    large ones (see its docstring)."""
    h_out, w_out = size
    n, h_in, w_in, c = x.shape
    if (h_in, w_in) == (h_out, w_out):
        return x
    wh, ww = resample_pair((h_in, w_in), size, circular)
    return apply_resample(x, jnp.asarray(wh), jnp.asarray(ww))


def resize_nearest_nhwc(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbour resize matching torch ``interpolate(mode="nearest")``
    (index = floor(i * in/out)); used for the mixing mask (optex.py:197)."""
    h_out, w_out = size
    _, h_in, w_in, _ = x.shape
    hi = np.minimum((np.arange(h_out) * (h_in / h_out)).astype(np.int64), h_in - 1)
    wi = np.minimum((np.arange(w_out) * (w_in / w_out)).astype(np.int64), w_in - 1)
    return x[:, hi][:, :, wi]

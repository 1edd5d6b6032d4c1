"""RGB <-> HLS conversion and color-transfer primitives.

The reference uses kornia's ``rgb_to_hls`` / ``hls_to_rgb``
(``/root/reference/optex.py:5,126-128``) to swap the lightness channel of the
content image with the pastiche's. Kornia's HLS convention: channel order
(H, L, S) with H in RADIANS [0, 2*pi), L and S in [0, 1] — matching Python's
``colorsys`` formulas with H scaled by 2*pi. Implemented here directly in jnp
(NHWC) with branchless selects; verified against colorsys in tests.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8
TWO_PI = 2.0 * jnp.pi


def rgb_to_hls(rgb: jnp.ndarray) -> jnp.ndarray:
    """NHWC RGB in [0,1] -> NHWC (H[rad], L, S)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    l = (maxc + minc) / 2.0
    delta = maxc - minc

    # saturation: delta / (1 - |2l - 1|), guarded for gray/extremes
    denom = 1.0 - jnp.abs(2.0 * l - 1.0)
    s = jnp.where(delta > 0, delta / jnp.maximum(denom, _EPS), 0.0)

    # hue sector selection, branchless
    safe_delta = jnp.where(delta > 0, delta, 1.0)
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(
        maxc == r, bc - gc,
        jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc),
    )
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0) * TWO_PI
    return jnp.stack([h, l, s], axis=-1)


def hls_to_rgb(hls: jnp.ndarray) -> jnp.ndarray:
    """NHWC (H[rad], L, S) -> NHWC RGB."""
    h = (hls[..., 0] / TWO_PI) % 1.0
    l, s = hls[..., 1], hls[..., 2]
    m2 = jnp.where(l <= 0.5, l * (1.0 + s), l + s - l * s)
    m1 = 2.0 * l - m2

    def channel(hue):
        hue = hue % 1.0
        return jnp.where(
            hue < 1.0 / 6.0, m1 + (m2 - m1) * hue * 6.0,
            jnp.where(hue < 0.5, m2,
                      jnp.where(hue < 2.0 / 3.0, m1 + (m2 - m1) * (2.0 / 3.0 - hue) * 6.0,
                                m1)),
        )

    r = channel(h + 1.0 / 3.0)
    g = channel(h)
    b = channel(h - 1.0 / 3.0)
    return jnp.stack([r, g, b], axis=-1)


def swap_lightness(content_rgb: jnp.ndarray, pastiche_rgb: jnp.ndarray) -> jnp.ndarray:
    """Content's hue+saturation with the pastiche's lightness
    (optex.py:126-128): the 'lum' color-transfer target."""
    hls = rgb_to_hls(content_rgb)
    past_l = rgb_to_hls(pastiche_rgb)[..., 1]
    hls = hls.at[..., 1].set(past_l)
    return hls_to_rgb(hls)

"""On-device Haar-random SO(N) sampling.

The reference draws rotations with ``scipy.stats.special_ortho_group.rvs`` on
the HOST, in float64, EVERY iteration (``/root/reference/optex.py:142-149``) —
a host<->device sync per sliced-OT step and its single worst performance sin.
Here the sampler is keyed jax PRNG + on-device QR: Haar-correct, fully inside
jit, and reproducible under ``--seed`` (which the reference's scipy path never
was — its rotations ignored torch.manual_seed).

Construction: QR of an N x N standard normal with the R-diagonal sign fix
gives Haar O(N); flipping one column's sign when det = -1 lands Haar SO(N).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def random_rotation(key: jax.Array, n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Haar-random special-orthogonal (n, n) matrix, det = +1."""
    g = jax.random.normal(key, (n, n), dtype=jnp.float32)
    q, r = jnp.linalg.qr(g)
    d = jnp.diagonal(r)
    d = jnp.where(d >= 0, 1.0, -1.0)
    q = q * d[None, :]
    # det(q) is +-1; flip the last column if -1 to land in SO(n).
    sign, _ = jnp.linalg.slogdet(q)
    q = q.at[:, -1].multiply(sign)
    return q.astype(dtype)

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
    """Haar-random special-orthogonal (n, n) matrix, det = +1 (QR path)."""
    g = jax.random.normal(key, (n, n), dtype=jnp.float32)
    q, r = jnp.linalg.qr(g)
    d = jnp.diagonal(r)
    d = jnp.where(d >= 0, 1.0, -1.0)
    q = q * d[None, :]
    # det(q) is +-1; flip the last column if -1 to land in SO(n).
    sign, _ = jnp.linalg.slogdet(q)
    q = q.at[:, -1].multiply(sign)
    return q.astype(dtype)


_POLAR_ITERS = 30


def random_rotations_polar(key: jax.Array, n_rot: int, n: int,
                           dtype=jnp.float32) -> jnp.ndarray:
    """(n_rot, n, n) Haar-random SO(n) matrices via Newton-Schulz polar
    iteration — the MXU-native sampler.

    The orthogonal polar factor of a Ginibre (iid normal) matrix is exactly
    Haar-distributed on O(n) (polar decomposition G = Q P with Q, P
    independent; O(n)-invariance of the Gaussian). The NS iteration
    X <- 1.5 X - 0.5 X X^T X converges to that polar factor using ONLY
    batched matmuls — unlike QR/Householder, whose sequential panel sweeps
    dominate TPU latency. All n_rot rotations for a stage are produced in
    one batched iteration, so per-step kernel latency amortizes across the
    whole stage. det = +1 enforced by flipping the last column where
    det < 0 (Haar on SO(n) conditional-flip construction, same as scipy's
    intent at optex.py:142-149).

    Convergence: X0 = G/||G||_F has singular values in (0, 1]; the linear
    phase multiplies small singular values by 1.5 per step, so 30 iterations
    cover sigma_min down to ~1e-5 — far below the ~1/sqrt(n) typical of
    Gaussian matrices. Orthogonality error at convergence is f32 roundoff.
    """
    g = jax.random.normal(key, (n_rot, n, n), dtype=jnp.float32)
    norm = jnp.sqrt(jnp.sum(g * g, axis=(1, 2), keepdims=True))
    x = g / norm

    def body(_, x):
        xtx = jnp.einsum("bij,bkj->bik", x, x, precision=jax.lax.Precision.HIGHEST)
        return 1.5 * x - 0.5 * jnp.einsum(
            "bij,bjk->bik", xtx, x, precision=jax.lax.Precision.HIGHEST)

    x = jax.lax.fori_loop(0, _POLAR_ITERS, body, x)
    sign, _ = jnp.linalg.slogdet(g)  # det(Q) sign == det(G) sign (P is PSD)
    x = x.at[:, :, -1].multiply(sign[:, None])
    return x.astype(dtype)


def stage_rotations(key: jax.Array, n_iters: int, n: int) -> jnp.ndarray:
    """The (n_iters, n, n) rotation stack used by every transport loop
    (single-device, batch-DP, spatial) — one batched polar sampling per
    stage. Centralized so all execution paths draw the identical stream for
    a given key and the multi-chip paths stay bit-comparable."""
    return random_rotations_polar(key, n_iters, n)


def stage_rotations_masked(key: jax.Array, n_iters: int, n: int,
                           k: jnp.ndarray) -> jnp.ndarray:
    """(n_iters, n, n) rotations of the form blockdiag(SO(k), I_{n-k}) with
    TRACED k — the k-bucketing construction (SURVEY §7: pad the PCA rank to
    a bucket so programs stay shape-stable across styles).

    Masking the Gaussian to blockdiag(G_k, I) before the Newton-Schulz polar
    iteration yields exactly blockdiag(polar(G_k), I): the iteration
    preserves block structure and the polar factor is scale-invariant, so
    the identity block passes through untouched. Features zero-padded beyond
    k therefore stay exactly zero through rotate -> match -> unrotate, and
    the bucketed computation equals the exact-k computation bit-for-fp.
    """
    g = jax.random.normal(key, (n_iters, n, n), dtype=jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 2)
    inside = (row < k) & (col < k)
    eye = (row == col).astype(jnp.float32)
    g = jnp.where(inside, g, eye)

    norm = jnp.sqrt(jnp.sum(g * g, axis=(1, 2), keepdims=True))
    x = g / norm

    def body(_, x):
        xtx = jnp.einsum("bij,bkj->bik", x, x, precision=jax.lax.Precision.HIGHEST)
        return 1.5 * x - 0.5 * jnp.einsum(
            "bij,bjk->bik", xtx, x, precision=jax.lax.Precision.HIGHEST)

    x = jax.lax.fori_loop(0, _POLAR_ITERS, body, x)
    # det fix: flip column k-1 (the last column INSIDE the active block —
    # flipping a pad column would break the identity block's invariance)
    sign, _ = jnp.linalg.slogdet(g)
    x = x * jnp.where(col == k - 1, sign[:, None, None], 1.0)
    return x

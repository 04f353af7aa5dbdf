"""Batched dense linear solves for the Newton iterations.

TPU constraints shape this module:
  * XLA's LuDecomposition supports only F32 on TPU (and the chip has no native
    f64 -- jax f64 is emulated with f32 exponent range), so f64 systems are
    solved as equilibrated f32 LU + f64 iterative refinement;
  * the LU factorization itself is the single most expensive kernel in the
    whole reactor solve (~9 ms for (32, 348, 348) on v5e vs ~0.8 ms for the
    full analytic Jacobian), so the API separates `factorize` from
    `solve_factored`, letting the Newton loops reuse one factorization across
    iterations (the PTC damping keeps slightly-stale factorizations useful --
    convergence is judged on exact residuals).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Factorization(NamedTuple):
    lu: jax.Array  # f32 LU factors of the equilibrated matrix
    piv: jax.Array
    row_scale: jax.Array  # (B, n)
    col_scale: jax.Array  # (B, n)
    A: jax.Array  # original matrix (for f64 refinement residuals)


def factorize(A) -> Factorization:
    """Equilibrate + f32 LU factor a batch of matrices A (B, n, n)."""
    r = 1.0 / jnp.maximum(jnp.max(jnp.abs(A), axis=2), 1e-30)  # (B, n)
    As = A * r[:, :, None]
    c = 1.0 / jnp.maximum(jnp.max(jnp.abs(As), axis=1), 1e-30)  # (B, n)
    As = As * c[:, None, :]
    lu, piv = jax.scipy.linalg.lu_factor(As.astype(jnp.float32))
    return Factorization(lu=lu, piv=piv, row_scale=r, col_scale=c, A=A)


def solve_factored(fac: Factorization, b, refine_iters: int | None = None):
    """Solve A x = b using a cached factorization; refine in f64 when A is f64."""
    if refine_iters is None:
        refine_iters = 2 if b.dtype == jnp.float64 else 0
    bs = b * fac.row_scale

    def solve32(rhs):
        return jax.scipy.linalg.lu_solve(
            (fac.lu, fac.piv), rhs.astype(jnp.float32)
        ).astype(b.dtype)

    y = solve32(bs)
    if refine_iters:
        As = fac.A * fac.row_scale[:, :, None] * fac.col_scale[:, None, :]
        for _ in range(refine_iters):
            resid = bs - jnp.einsum("bij,bj->bi", As, y)
            y = y + solve32(resid)
    return y * fac.col_scale


def batched_solve(A, b, refine_iters: int | None = None):
    """One-shot solve A x = b for batches: A (B, n, n), b (B, n) -> (B, n)."""
    if A.dtype == jnp.float64 and jax.default_backend() != "tpu":
        return jnp.linalg.solve(A, b[..., None])[..., 0]
    return solve_factored(factorize(A), b, refine_iters)

"""Batched dense linear solves for the Newton iterations.

TPU constraint: XLA's LuDecomposition supports only F32 on TPU, and the chip has
no native f64 anyway (jax f64 is emulated with f32 exponent range). So on TPU we
solve in mixed precision -- row-equilibrate, factorize in f32, then do f64
iterative refinement -- which is also the *fast* design: the O(n^3) work runs on
the MXU in f32 while accuracy is recovered by cheap O(n^2) residual passes.
Newton only needs the step direction to be roughly right; convergence is always
declared on the exact residual (reactors/cstr.py).

On CPU (tests) the plain f64 batched solve is used.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def batched_solve(A, b, refine_iters: int = 2):
    """Solve A x = b for batches: A (B, n, n), b (B, n) -> (B, n)."""
    if A.dtype == jnp.float64 and jax.default_backend() == "tpu":
        return _mixed_precision_solve(A, b, refine_iters)
    return jnp.linalg.solve(A, b[..., None])[..., 0]


def _mixed_precision_solve(A, b, refine_iters: int):
    """f32 LU + f64 iterative refinement with two-sided equilibration.

    Row scales span ~1e12 between trace radicals and bulk species, and column
    scales (d/dY of trace species) vary just as widely -- equilibrating both
    keeps the f32 factorization's condition number within refinement reach.
    """
    r = 1.0 / jnp.maximum(jnp.max(jnp.abs(A), axis=2), 1e-30)  # (B, n)
    As = A * r[:, :, None]
    c = 1.0 / jnp.maximum(jnp.max(jnp.abs(As), axis=1), 1e-30)  # (B, n)
    As = As * c[:, None, :]
    bs = b * r

    lu, piv = jax.scipy.linalg.lu_factor(As.astype(jnp.float32))

    def solve32(rhs):
        return jax.scipy.linalg.lu_solve((lu, piv), rhs.astype(jnp.float32)).astype(
            A.dtype
        )

    y = solve32(bs)
    for _ in range(refine_iters):
        resid = bs - jnp.einsum("bij,bj->bi", As, y)
        y = y + solve32(resid)
    return y * c

"""Batched dense linear solves for the Newton iterations.

v1 uses XLA's batched LU (jnp.linalg.solve) which maps well to TPU for the
(B, n, n) shapes produced by the reactor solvers. A Pallas blocked-LU kernel can
be swapped in behind the same interface (see hexpyro/ops).
"""

from __future__ import annotations

import jax.numpy as jnp


def batched_solve(A, b):
    """Solve A x = b for batches: A (B, n, n), b (B, n) -> (B, n)."""
    return jnp.linalg.solve(A, b[..., None])[..., 0]

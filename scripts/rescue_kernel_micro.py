#!/usr/bin/env python
"""Microbenchmark the LU-rescue path's kernel alternatives on the real chip.

Round-4 instrumented benches show the Jacobian-refresh LU rescue is the
dominant wall-time term of the official NUIG config (~77 rescues x ~35 ms
estimated), and the blocked-LU A/B REGRESSED 2.8x (runs/bench_r4/ab2_p128) --
evidence the kernel is LATENCY-bound (sequential column steps), not
bandwidth-bound, so panel blocking (same sequential depth + extra kernels)
cannot help. This times every candidate building block at the official shape
(B=16, n=924 NUIG; plus 654 LLNL / 348 JetSurf) to pick the next attack:

  lu_factor        XLA LuDecomposition (current rescue factorization)
  blocked p128/256 solvers/linalg.blocked_lu_factor (confirm the regression)
  qr               XLA blocked-Householder QR (alternative factorization)
  lu_solve_eye     inverse formation from LU (n-RHS triangular solves)
  qr_inverse       R^-1 Q^T via triangular_solve (alternative inverse)
  inverse_init     full current rescue (factor + form inverse)
  mm_highest/def   one (B,n,n)x(B,n,n) matmul at f32-HIGHEST vs DEFAULT
  tri_solve_1rhs   one back-substitution (the carry-the-factorization option)

Usage: python scripts/rescue_kernel_micro.py [n ...]   (default 924 654 348)
Writes one JSON line per (n, kernel) and a summary to stdout.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("HEXPYRO_CACHE", "/root/.cache/hexpyro")
import jax

if os.environ.get("HEXPYRO_PLATFORM"):  # this axon build ignores JAX_PLATFORMS
    jax.config.update("jax_platforms", os.environ["HEXPYRO_PLATFORM"])
jax.config.update("jax_default_matmul_precision", "highest")
cache_dir = "/root/.cache/jax_compile"
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)

import jax.numpy as jnp
import numpy as np

from hexpyro.solvers.linalg import blocked_lu_factor, inverse_init

B = int(os.environ.get("HEXPYRO_MICRO_B", "16"))
REPS = int(os.environ.get("HEXPYRO_MICRO_REPS", "10"))


def bench(name, fn, *args):
    fn_j = jax.jit(fn)
    out = jax.block_until_ready(fn_j(*args))  # compile + warm
    t0 = time.time()
    for _ in range(REPS):
        out = jax.block_until_ready(fn_j(*args))
    ms = (time.time() - t0) / REPS * 1e3
    return name, ms, out


def well_conditioned_system(n, key):
    """Random diagonally-dominant batch (mimics an equilibrated Jacobian)."""
    A = jax.random.normal(key, (B, n, n), jnp.float32) / np.sqrt(n)
    return A + 3.0 * jnp.eye(n, dtype=jnp.float32)


def main():
    ns = [int(a) for a in sys.argv[1:]] or [924, 654, 348]
    dev = str(jax.devices()[0])
    results = {}
    for n in ns:
        key = jax.random.PRNGKey(0)
        A = well_conditioned_system(n, key)
        b1 = jax.random.normal(jax.random.PRNGKey(1), (B, n), jnp.float32)
        eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (B, n, n))
        lu, piv = jax.jit(jax.scipy.linalg.lu_factor)(A)
        lu, piv = jax.block_until_ready((lu, piv))
        q, r = jax.block_until_ready(jax.jit(jnp.linalg.qr)(A))

        rows = []
        rows.append(bench("lu_factor", jax.scipy.linalg.lu_factor, A)[:2])
        for p in (128, 256):
            if n > p:
                rows.append(bench(
                    f"blocked_lu_p{p}", lambda A, p=p: blocked_lu_factor(A, p), A
                )[:2])
        rows.append(bench("qr", jnp.linalg.qr, A)[:2])
        rows.append(bench(
            "lu_solve_eye", lambda lu, piv: jax.scipy.linalg.lu_solve((lu, piv), eye),
            lu, piv,
        )[:2])

        def qr_inverse(q, r):
            # A^-1 = R^-1 Q^T: one triangular solve against Q^T
            return jax.lax.linalg.triangular_solve(
                r, jnp.swapaxes(q, 1, 2), left_side=True, lower=False
            )

        rows.append(bench("qr_inverse", qr_inverse, q, r)[:2])
        rows.append(bench("inverse_init", inverse_init, A)[:2])
        rows.append(bench(
            "mm_highest",
            lambda a, b: jnp.matmul(a, b, precision="highest"), A, A,
        )[:2])
        rows.append(bench(
            "mm_default",
            lambda a, b: jnp.matmul(a, b, precision="default"), A, A,
        )[:2])
        rows.append(bench(
            "tri_solve_1rhs",
            lambda lu, b: jax.lax.linalg.triangular_solve(
                lu, b[:, :, None], left_side=True, lower=False
            ),
            lu, b1,
        )[:2])
        # correctness spot-check: qr inverse actually inverts
        Xq = jax.jit(qr_inverse)(q, r)
        err = float(jnp.max(jnp.abs(
            jnp.matmul(A, Xq, precision="highest") - eye)))
        results[n] = {"rows": dict(rows), "qr_inv_err": err}
        for name, ms in rows:
            print(json.dumps({"n": n, "B": B, "kernel": name,
                              "ms": round(ms, 2), "device": dev}))
    print(json.dumps({"summary": results, "device": dev}, default=str))


if __name__ == "__main__":
    main()

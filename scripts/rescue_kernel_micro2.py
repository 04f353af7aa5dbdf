#!/usr/bin/env python
"""In-graph microbenchmark of the rescue-path kernels (v2).

v1 (rescue_kernel_micro.py) timed isolated dispatches and hit a ~28 ms
per-call floor on this axon tunnel (a trivial f32 matmul and a 924-wide LU
both "cost" ~28 ms, while some factorizations reported microseconds) -- the
numbers measure the tunnel, not the kernel. The PFR pays these kernels
INSIDE one compiled while/scan graph, so v2 measures the same way: K
data-dependent iterations of each kernel inside one lax.scan under one jit,
per-iteration cost = (t_K - t_0) / K. The data dependency (A perturbed by the
previous iteration's output) prevents XLA from hoisting or deduplicating the
chain.

Usage: python scripts/rescue_kernel_micro2.py [n ...]  (default 924 654 348)
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

from hexpyro.solvers.linalg import blocked_lu_factor

B = int(os.environ.get("HEXPYRO_MICRO_B", "16"))
K = int(os.environ.get("HEXPYRO_MICRO_K", "10"))
REPS = int(os.environ.get("HEXPYRO_MICRO_REPS", "3"))
ONLY = os.environ.get("HEXPYRO_MICRO_KERNELS")  # comma list; default all


def chain_time(kernel, A):
    """Median wall time of K data-dependent in-graph kernel applications."""

    def body(carry, _):
        Acur = carry
        out = kernel(Acur)
        # fold a scalar of the FULL output back into A: the reduction must
        # touch every element, or XLA slices through the kernel (a first-row
        # dependency let it elide whole factorizations -- measured 0 ms);
        # tanh bounds it so the 1e-12 perturbation never moves A
        leaves = jax.tree_util.tree_leaves(out)
        s = sum(jnp.tanh(jnp.sum(l.astype(jnp.float32)) * 1e-6)
                for l in leaves if l.ndim >= 2)
        return Acur + s * 1e-12, None

    @jax.jit
    def run(A):
        out, _ = jax.lax.scan(body, A, None, length=K)
        return jnp.sum(out)

    # NOTE: on this axon tunnel backend block_until_ready does NOT reliably
    # synchronize (a 20-matmul chain "completed" in 0.1 ms while the next
    # dispatch absorbed the backlog), so sync by fetching the scalar result
    # to the host -- the device->host copy cannot complete early.
    float(run(A))  # compile + warm
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        float(run(A))
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    ns = [int(a) for a in sys.argv[1:]] or [924, 654, 348]
    dev = str(jax.devices()[0])
    for n in ns:
        A = jax.random.normal(jax.random.PRNGKey(0), (B, n, n), jnp.float32)
        A = A / jnp.sqrt(float(n)) + 3.0 * jnp.eye(n, dtype=jnp.float32)
        eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (B, n, n))

        kernels = {
            "noop_baseline": lambda A: (A[:, :1, :1],),
            "lu_factor": jax.scipy.linalg.lu_factor,
            "blocked_lu_p128": lambda A: blocked_lu_factor(A, 128),
            "blocked_lu_p256": lambda A: blocked_lu_factor(A, 256),
            "qr": jnp.linalg.qr,
            "mm_highest": lambda A: jnp.matmul(A, A, precision="highest"),
            "mm_default": lambda A: jnp.matmul(A, A, precision="default"),
            "lu_then_inverse": lambda A: jax.scipy.linalg.lu_solve(
                jax.scipy.linalg.lu_factor(A), eye
            ),
            "qr_then_inverse": lambda A: jax.lax.linalg.triangular_solve(
                jnp.linalg.qr(A)[1],
                jnp.swapaxes(jnp.linalg.qr(A)[0], 1, 2),
                left_side=True, lower=False,
            ),
            "tri_solve_1rhs": lambda A: jax.lax.linalg.triangular_solve(
                A, A[:, :, :1], left_side=True, lower=False
            ),
        }
        if ONLY:
            keep = set(ONLY.split(",")) | {"noop_baseline"}
            kernels = {k: v for k, v in kernels.items() if k in keep}
        base = chain_time(kernels.pop("noop_baseline"), A)
        print(json.dumps({"n": n, "B": B, "K": K,
                          "noop_chain_s": round(base, 4), "device": dev}),
              flush=True)
        for name, kern in kernels.items():
            print(f"# timing {name} ...", file=sys.stderr, flush=True)
            t = chain_time(kern, A)
            per_ms = (t - base) / K * 1e3
            print(json.dumps({"n": n, "B": B, "kernel": name,
                              "per_call_ms": round(per_ms, 2)}), flush=True)


if __name__ == "__main__":
    main()

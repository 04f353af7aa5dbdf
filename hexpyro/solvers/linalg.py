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


def equilibrate(A):
    """Two-sided max equilibration: returns (As, r, c) with As = diag(r) A diag(c)."""
    r = 1.0 / jnp.maximum(jnp.max(jnp.abs(A), axis=2), 1e-30)  # (B, n)
    As = A * r[:, :, None]
    c = 1.0 / jnp.maximum(jnp.max(jnp.abs(As), axis=1), 1e-30)  # (B, n)
    return As * c[:, None, :], r, c


def factorize(A) -> Factorization:
    """Equilibrate + f32 LU factor a batch of matrices A (B, n, n)."""
    As, r, c = equilibrate(A)
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


# ---------------------------------------------------------------------------
# MXU-native alternative: Newton-Schulz-maintained approximate inverse
# ---------------------------------------------------------------------------
#
# XLA's TPU LU is a column-sequential loop (~30-60 ms at n=925); for the large
# mechanisms it dominates the whole reactor solve. Instead we carry X ~= A^-1
# across Newton iterations/segments and maintain it with Newton-Schulz updates
# X <- X (2I - A X): pure batched matmuls that run at MXU speed. X is used as a
# PRECONDITIONER for Richardson iteration (delta += X (b - A delta)), which
# converges whenever ||I - A X|| < 1, so X only needs ~1 digit of quality --
# robust to f32 and to stale state. When the quality check fails, X is
# reinitialized from a true (slow) LU inverse under a lax.cond.


def blocked_lu_factor(A, panel: int = 128):
    """Right-looking blocked LU with panel partial pivoting, batched f32.

    XLA's TPU LuDecomposition is column-sequential over all n columns; at
    mechanism sizes (n ~ 650-925) it is the dominant wall-time kernel of the
    whole reactor solve. This factors `panel`-wide column blocks with the
    sequential kernel (depth `panel` instead of n) and applies each trailing
    update as ONE big MXU matmul, the classic LAPACK getrf blocking.

    Pivoting is PANEL partial pivoting (rows are selected within the trailing
    rows of the current panel only -- exactly what LAPACK does), so the
    factorization is elementwise-comparable to lu_factor up to the usual
    tie-breaking. Returns (lu, piv) in `jax.scipy.linalg.lu_factor` format
    (combined L\\U in one matrix, piv[i] = row swapped with i, 0-based), so
    `lu_solve`/`solve_factored` consume it unchanged.
    """
    B, n, _ = A.shape
    lu = A.astype(jnp.float32)
    piv_parts = []
    for m0 in range(0, n, panel):  # static python loop: unrolled under jit
        b = min(panel, n - m0)
        P = lu[:, m0:, m0 : m0 + b]
        lu_p, piv_p, perm_p = jax.lax.linalg.lu(P)
        piv_parts.append(m0 + piv_p)
        # apply the panel's row permutation to the other columns of the
        # trailing rows (left: already-computed L columns; right: untouched)
        if m0:
            left = jnp.take_along_axis(
                lu[:, m0:, :m0], perm_p[:, :, None], axis=1
            )
            lu = lu.at[:, m0:, :m0].set(left)
        lu = lu.at[:, m0:, m0 : m0 + b].set(lu_p)
        if m0 + b < n:
            right = jnp.take_along_axis(
                lu[:, m0:, m0 + b :], perm_p[:, :, None], axis=1
            )
            # U12 = L11^-1 A12 (unit-lower triangular solve, b x b)
            U12 = jax.lax.linalg.triangular_solve(
                lu_p[:, :b, :], right[:, :b, :], left_side=True, lower=True,
                unit_diagonal=True,
            )
            # trailing update A22 -= L21 @ U12: the MXU matmul that carries
            # almost all of the factorization's FLOPs
            A22 = right[:, b:, :] - jnp.matmul(
                lu_p[:, b:, :], U12, preferred_element_type=jnp.float32
            )
            lu = lu.at[:, m0 : m0 + b, m0 + b :].set(U12)
            lu = lu.at[:, m0 + b :, m0 + b :].set(A22)
    return lu, jnp.concatenate(piv_parts, axis=1)


def inverse_init(A, lu_panel: int = 0, kind: str = "lu"):
    """True inverse (slow; used to seed / rescue the NS inverse).

    kind="lu": f32 LU + two triangular n-RHS solves against I. In-graph
    microbenchmark at (16, 924, 924) on v5e: 12.5 ms factor + 7.8 ms inverse
    formation (scripts/rescue_kernel_micro2.py).

    kind="qr": f32 Householder QR, inverse = R^-1 Q^T -- ONE triangular n-RHS
    solve (Q^T is a free transpose). Measured 18.0 ms vs LU's 20.3 ms at the
    same shape; also unconditionally stable (no pivot growth).

    lu_panel > 0 routes the LU through `blocked_lu_factor` (panel width =
    lu_panel) instead of XLA's column-sequential LuDecomposition -- measured
    NOT faster (the TPU LU is latency-bound), kept for A/B.
    """
    B, n, _ = A.shape
    if kind == "qr":
        q, r = jnp.linalg.qr(A.astype(jnp.float32))
        return jax.lax.linalg.triangular_solve(
            r, jnp.swapaxes(q, 1, 2), left_side=True, lower=False
        ).astype(A.dtype)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (B, n, n))
    if lu_panel and n > lu_panel:
        lu, piv = blocked_lu_factor(A, panel=lu_panel)
    else:
        lu, piv = jax.scipy.linalg.lu_factor(A.astype(jnp.float32))
    return jax.scipy.linalg.lu_solve((lu, piv), eye).astype(A.dtype)


def inverse_refresh(X, A, ns_iters: int = 2, bad_threshold: float = 0.9,
                    precision=None, allow_rescue=True, lu_panel: int = 0,
                    rescue_kind: str = "lu"):
    """Newton-Schulz update of X toward A^-1, with LU rescue on divergence.

    Returns (X, rescued): `rescued` is a traced bool recording whether the
    column-sequential LU rescue fired (the expensive non-MXU kernel) -- the
    callers thread it up to PFRTrajectory.prec_rescues for the FLOP/MFU
    accounting in bench.py.

    `precision` is the matmul precision for the NS updates: a preconditioner
    only needs ~1 digit of quality (Richardson converges whenever
    ||I - A X|| < 1), so bf16-speed DEFAULT matmuls are admissible here even
    though the kinetics path requires HIGHEST (see bench.py) -- convergence is
    always declared on the exact residual computed outside this module.

    The quality of the INCOMING X is gated BEFORE the NS updates run: NS
    contracts iff ||I - A X||_inf < 1 (||E_{k+1}|| <= ||E_k||^2 in any
    submultiplicative norm), so when the carried inverse is formally divergent
    no amount of polishing can save it and the LU rescue is reached after ONE
    matmul instead of 2*ns_iters. The round-4 instrumented bench measured this
    as the dominant refresh regime (77/77 NUIG, 69/69 JetSurf, 918/918 LLNL
    refreshes were hard failures; a ns_iters=6 A/B bought 47% more FLOP/s for
    9% LESS throughput), so the pre-gate removes ~3/4 of the refresh-path NS
    matmul work in practice while leaving the contracting case untouched: a
    healthy carry pays exactly the same 2*ns_iters matmuls as before (the
    gate's E0 doubles as the first step's error term).
    """
    B, n, _ = A.shape
    eye = jnp.eye(n, dtype=A.dtype)

    def mm(a, b):
        return jnp.matmul(a, b, precision=precision,
                          preferred_element_type=A.dtype)

    def inf_norm(E):
        # TRUE induced infinity norm ||I - A X||_inf (max abs row sum):
        # Richardson converges iff this is < 1. An earlier max|E|*n bound
        # overestimated by up to n and made the LU rescue fire on virtually
        # EVERY refresh at NUIG size, hiding the point of the matmul-only path.
        return jnp.max(jnp.sum(jnp.abs(E), axis=2), axis=1)

    E0 = eye - mm(A, X)
    resid0 = inf_norm(E0)
    # hard failure (always rescue, and skip the NS steps entirely): non-finite
    # X, or resid >= 1 where both NS and Richardson are formally divergent (a
    # zero/fresh X gives resid == 1)
    hopeless = jnp.any(~jnp.isfinite(resid0)) | jnp.any(resid0 >= 1.0)

    def rescue(_):
        return (
            inverse_init(A, lu_panel=lu_panel, kind=rescue_kind),
            jnp.ones((), bool),
        )

    def polish(_):
        X1, E = X + mm(X, E0), E0
        for _ in range(ns_iters - 1):
            E = eye - mm(A, X1)
            X1 = X1 + mm(X1, E)
        # soft failure (rescue only when `allow_rescue`): post-polish quality
        # in the band between bad_threshold and 1, where Richardson still
        # contracts, just slowly -- suppressing those rescues trades Newton
        # iterations for LU kernels. Gate semantics match the pre-gate-less
        # version: the quality of X_{k-1} (last computed E) accepts X_k.
        soft = jnp.any(inf_norm(E) > bad_threshold) & jnp.asarray(allow_rescue)
        return (
            jax.lax.cond(
                soft,
                lambda _: inverse_init(A, lu_panel=lu_panel, kind=rescue_kind),
                lambda _: X1, None,
            ),
            soft,
        )

    return jax.lax.cond(hopeless, rescue, polish, None)


def precond_solve(X, A, b, iters: int = 3, precision=None):
    """Richardson iteration preconditioned by X ~= A^-1 (n^2 matvecs).

    The X-apply matvecs may run at reduced `precision` (preconditioner
    quality); the residual matvec r = b - A x keeps full precision so the
    returned solution is as good as the iteration allows.
    """
    x = jnp.einsum("bij,bj->bi", X, b, precision=precision)
    for _ in range(iters):
        r = b - jnp.einsum("bij,bj->bi", A, x)
        x = x + jnp.einsum("bij,bj->bi", X, r, precision=precision)
    return x


class NSInverse(NamedTuple):
    """Carried state of the Newton-Schulz preconditioner (equilibrated space)."""

    X: jax.Array  # (B, n, n) ~= As^-1
    As: jax.Array  # (B, n, n) equilibrated system matrix
    r: jax.Array  # (B, n) row scales
    c: jax.Array  # (B, n) col scales


def ns_init_state(B: int, n: int, dtype) -> NSInverse:
    z = jnp.zeros((B, n, n), dtype)
    one = jnp.ones((B, n), dtype)
    return NSInverse(X=z, As=z, r=one, c=one)


def ns_refresh_state(st: NSInverse, A, ns_iters: int = 2, precision=None,
                     allow_rescue=True, lu_panel: int = 0,
                     rescue_kind: str = "lu"):
    """Re-equilibrate a new A and NS-update X (rescaled across scale changes).

    As_new^-1 = diag(c_old/c_new) As_old^-1 diag(r_old/r_new); starting from the
    rescaled old X, a couple of Newton-Schulz matmul steps re-converge it. A
    zero/diverged X triggers the in-refresh LU rescue automatically;
    `allow_rescue` (python or traced bool) can suppress the quality-based
    rescue for refreshes where a weaker preconditioner is acceptable.
    Returns (NSInverse, rescued bool) -- see inverse_refresh.
    """
    As, r, c = equilibrate(A)
    X0 = st.X * (st.c / c)[:, :, None] * (st.r / r)[:, None, :]
    X, rescued = inverse_refresh(X0, As, ns_iters=ns_iters, precision=precision,
                                 allow_rescue=allow_rescue, lu_panel=lu_panel,
                                 rescue_kind=rescue_kind)
    return NSInverse(X=X, As=As, r=r, c=c), rescued


def ns_solve(st: NSInverse, b, iters: int = 3, precision=None):
    """Solve A x = b with the carried preconditioner (n^2 matvecs only)."""
    y = precond_solve(st.X, st.As, b * st.r, iters=iters, precision=precision)
    return y * st.c

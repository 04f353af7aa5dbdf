"""Time-accurate stiff integration of isothermal constant-pressure batch reactors.

Replaces Cantera's `IdealGasConstPressureReactor(energy='off')` + CVODES
`sim.advance(t)` used by the stage-1 feed-consumption probe (reference:
INITIAL_ARRHENIUS_PARAMETER_OPTIMIZATION/reactant_consumption_rate.py:49-76).

ODE (per unit mass, constant T and P): dY_k/dt = wdot_k W_k / rho(T, P, Y).

Integrator: batched adaptive implicit Euler with step doubling + Richardson
extrapolation (2nd-order accurate, L-stable). Each step solves three nonlinear
systems (one h step, two h/2 steps) by damped Newton reusing one Jacobian; the
difference between the h and h/2 solutions gives the local error estimate. All
lanes advance in one `lax.while_loop` with converged/finished masking, so the
dense linear algebra stays batched (same design as reactors/cstr.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..mechanism.arrays import MechanismArrays
from ..reactors.cstr import _jac_YY
from ..solvers.linalg import batched_solve
from ..thermo import nasa7


@dataclasses.dataclass(frozen=True)
class BatchOptions:
    """Defaults sized for the stage-1 probe (~1% rate accuracy needed);
    tighten rtol/atol for research-grade time accuracy."""

    rtol: float = 1e-3
    atol: float = 1e-7
    newton_iters: int = 3
    max_steps: int = 4000
    h0_frac: float = 1e-5  # initial step as fraction of the span
    grow_max: float = 10.0
    # the propagated solution is Richardson-extrapolated (one order better than
    # the controlled implicit-Euler difference), so accept estimates up to this
    accept_fac: float = 4.0


def _rhs(Y, T, P, arr: MechanismArrays):
    from ..kinetics.wdot import wdot

    rho = nasa7.density(T, P, Y, arr.mw)
    C = rho[:, None] * Y / arr.mw
    return wdot(T, P, C, arr) * arr.mw / rho[:, None]


def _newton_solve(Y0, Yguess, h, T, P, arr, iters):
    """Solve Y = Y0 + h f(Y) by damped Newton with one Jacobian evaluation.

    h: (B,) per-lane step sizes.
    """
    # Jacobian of f at the guess; flow term zero => pass mdot_over_V = 0
    J, _, _, _ = _jac_YY(T, P, Yguess, jnp.zeros_like(T), arr)
    n = Y0.shape[1]
    A = jnp.eye(n, dtype=Y0.dtype) - h[:, None, None] * J

    def body(i, Y):
        F = Y - Y0 - h[:, None] * _rhs(Y, T, P, arr)
        delta = batched_solve(A, -F)
        Y = jnp.clip(Y + delta, 0.0, 1.0)
        return Y / jnp.sum(Y, axis=1, keepdims=True)

    return jax.lax.fori_loop(0, iters, body, Yguess)


def advance_batch(arr: MechanismArrays, Y0, T, P, t_span, opts: BatchOptions = BatchOptions()):
    """Advance batched isothermal const-P batch reactors from t=0 to t_span.

    Y0 (B, ns), T/P (B,), t_span scalar. Returns Y(t_span) (B, ns).
    """
    dtype = Y0.dtype
    B, ns = Y0.shape

    def err_norm(e, Y):
        scale = opts.rtol * jnp.abs(Y) + opts.atol
        return jnp.max(jnp.abs(e) / scale, axis=1)

    def cond(state):
        t, Y, h, it, done = state
        return jnp.logical_and(it < opts.max_steps, ~jnp.all(done))

    def body(state):
        t, Y, h, it, done = state
        h_eff = jnp.minimum(h, t_span - t)
        # one full step and two half steps (Richardson)
        Y_big = _newton_solve(Y, Y, h_eff, T, P, arr, opts.newton_iters)
        Y_half = _newton_solve(Y, Y, 0.5 * h_eff, T, P, arr, opts.newton_iters)
        Y_two = _newton_solve(Y_half, Y_half, 0.5 * h_eff, T, P, arr, opts.newton_iters)
        err = err_norm(Y_two - Y_big, Y_two) / opts.accept_fac
        accept = err <= 1.0
        Y_new = jnp.clip(2.0 * Y_two - Y_big, 0.0, 1.0)  # extrapolated (2nd order)
        Y_new = Y_new / jnp.sum(Y_new, axis=1, keepdims=True)
        t_new = t + h_eff
        factor = jnp.clip(0.9 / jnp.sqrt(jnp.maximum(err, 1e-10)), 0.2, opts.grow_max)
        h_new = jnp.clip(h * factor, 1e-16 * t_span, t_span)
        adv = jnp.logical_and(accept, ~done)
        t_out = jnp.where(adv, t_new, t)
        newly_done = t_out >= t_span * (1.0 - 1e-12)
        return (
            t_out,
            jnp.where(adv[:, None], Y_new, Y),
            jnp.where(done, h, h_new),
            it + 1,
            jnp.logical_or(done, newly_done),
        )

    state0 = (
        jnp.zeros((B,), dtype),
        Y0,
        jnp.full((B,), opts.h0_frac * t_span, dtype),
        jnp.zeros((), jnp.int32),
        jnp.zeros((B,), bool),
    )
    t, Y, h, it, done = jax.lax.while_loop(cond, body, state0)
    return Y, done

"""Differentiable adaptive Dormand-Prince RK45 (dopri5) in pure jax.

Replaces `torchdiffeq.odeint(..., method='dopri5')` used for the CRNN neural
ODE (reference: SURROGATE_MODEL_TRAINING/Eoff_surrogate_model_training.py:397,
SURROGATE_MODEL/surrogate_model_Eoff_single_model.py:185). Like the reference,
gradients flow by backpropagating through the solver steps
(discretise-then-optimise), so the integrator is built on bounded `lax.scan`s
with masked accept/reject logic instead of a `while_loop` (which jax cannot
reverse-differentiate).

Structure (TPU): an outer scan over the T-1 OUTPUT INTERVALS whose per-interval
result is emitted as scan output, with an inner fixed-budget scan of
`max_steps_per_interval` adaptive RK steps inside. The output array is never
carried through the scan -- an earlier design carried the full (T, n) solution
in the carry, which cost a whole-array copy per RK step and made reverse-mode
save an O(steps * T * n) residual (OOM at batch 256 on a v5e). The interval
body is `jax.checkpoint`ed: backward recomputes each interval's few RK steps
from the (t, u, h) carry, so training memory is O(T) regardless of batch.

The solver lands EXACTLY on every requested output time by clipping the step to
the interval end -- with the reference's 801-point grids this costs no extra
steps at the loose training tolerances and avoids dense-output interpolants
entirely. vmap over trajectories for batched solves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Dormand-Prince 5(4) tableau. Plain numpy: a module-level jnp.array would
# initialize the jax backend at import time -- before callers can pick a
# platform, and blocking on the TPU lockfile if another process holds the chip.
_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_B5 = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_B4 = np.array(
    [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]
)

_SAFETY = 0.9
_MIN_FACTOR = 0.2
_MAX_FACTOR = 5.0


def odeint_dopri5(rhs, u0, ts, *, rtol=1e-6, atol=1e-6, max_steps_per_interval=16):
    """Integrate du/dt = rhs(t, u) landing on each point of ts.

    Args:
      rhs: (t, u) -> du/dt, u shape (n,).
      u0: (n,) initial state at ts[0].
      ts: (T,) strictly increasing output times.
      max_steps_per_interval: adaptive-step budget per output interval.

    Returns ys (T, n); ys[i] ~ u(ts[i]). Differentiable wrt u0 and any closed-
    over parameters of rhs. If an interval's step budget runs out, its output
    is the state reached so far (the remaining span is integrated while
    chasing the NEXT output times, so a locally exhausted budget lags rather
    than freezes the trajectory); check `jnp.isfinite`/monotonicity downstream
    if exactness matters.
    """
    dtype = u0.dtype
    # the time grid must live at the state dtype too: an f64 ts with f32 state
    # promotes h_eff = min(h, t_target - t) and breaks the scan carry with a
    # dtype TypeError (f32 callers passing f64 grids are common under x64)
    ts = jnp.asarray(ts, dtype)
    t_end = ts[-1]
    h_floor = 1e-14 * jnp.maximum(t_end, 1.0)
    # "reached the target" slack: a few ulps of the target magnitude
    eps_hit = 32.0 * jnp.finfo(dtype).eps
    # tableau constants at the state dtype: the module-level arrays are f64
    # when x64 is enabled at import, and an f64 @ f32 matmul would promote the
    # scan carry (TypeError) / silently upcast the whole solve
    c_t = _C.astype(dtype)
    b5 = _B5.astype(dtype)
    b4 = _B4.astype(dtype)

    def rk_step(t, u, h):
        ks = []
        for i in range(7):
            ui = u
            for j, a in enumerate(_A[i]):
                ui = ui + h * a * ks[j]
            ks.append(rhs(t + c_t[i] * h, ui))
        k = jnp.stack(ks)  # (7, n)
        u5 = u + h * (b5 @ k)
        u4 = u + h * (b4 @ k)
        err = u5 - u4
        scale = atol + rtol * jnp.maximum(jnp.abs(u), jnp.abs(u5))
        err_norm = jnp.sqrt(jnp.mean((err / scale) ** 2))
        return u5, err_norm

    @jax.checkpoint
    def interval(carry, t_target):
        def step(state, _):
            t, u, h = state
            remaining = t_target - t
            finished = remaining <= eps_hit * jnp.maximum(jnp.abs(t_target), h_floor)
            h_eff = jnp.maximum(jnp.minimum(h, remaining), h_floor)
            u_new, err_norm = rk_step(t, u, h_eff)
            # step-size control is non-differentiable bookkeeping: block
            # gradients through it (torchdiffeq does the same), otherwise the
            # err_norm -> h chain injects NaNs (d sqrt at 0)
            err_norm = jax.lax.stop_gradient(err_norm)
            accept = jnp.logical_and(err_norm <= 1.0, ~finished)
            t = jnp.where(accept, t + h_eff, t)
            u = jnp.where(accept, u_new, u)
            factor = jnp.clip(
                _SAFETY * jnp.maximum(err_norm, 1e-10) ** (-0.2),
                _MIN_FACTOR, _MAX_FACTOR,
            )
            clipped = h_eff < h  # shortened only to land on the output time
            h_accept = jnp.where(clipped, jnp.maximum(h, h_eff * factor), h * factor)
            h_reject = h_eff * jnp.minimum(factor, 0.9)
            h_next = jnp.where(accept, h_accept, h_reject)
            h_next = jax.lax.stop_gradient(jnp.where(finished, h, h_next))
            return (t, u, h_next), None

        carry, _ = jax.lax.scan(step, carry, None, length=max_steps_per_interval)
        return carry, carry[1]

    h0 = jnp.maximum((ts[1] - ts[0]) * 0.5, h_floor).astype(dtype)
    (_, _, _), ys_tail = jax.lax.scan(interval, (ts[0], u0, h0), ts[1:])
    return jnp.concatenate([u0[None], ys_tail], axis=0)


def odeint_dopri5_batch(rhs, u0, ts, **kw):
    """vmap wrapper: u0 (B, n), ts (B, T) -> (B, T, n).

    rhs signature stays (t, u) with per-sample broadcasting handled by vmap;
    pass a rhs that closes over per-sample quantities via the `args` trick:
    here rhs is called per sample so closures must be batched externally --
    prefer `jax.vmap(lambda u0, ts, extra: odeint_dopri5(...))` at call sites
    needing per-sample interpolants.
    """
    return jax.vmap(lambda u, t: odeint_dopri5(rhs, u, t, **kw))(u0, ts)

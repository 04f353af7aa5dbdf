"""Steady-state CSTR solver: the TPU-native replacement for Cantera's
`sim.advance_to_steady_state()` inner loop.

Reference semantics being reproduced (derivation):
each PFR segment in the reference is an `ct.IdealGasReactor` fed by a
`MassFlowController` and vented through a `PressureController` into a reservoir
held at the initial state, integrated to steady state with CVODES
(CRNN_TEMP_PRED_MODEL_TRAINING_DATASET_GENERATION/simul_data_gene_fix_chain_2D.py:81-160).
At steady state:
  * mass balance + PressureController  =>  P = P0 (the downstream reservoir
    pressure), because m_out = m_in + K (P - P0) and dm/dt = 0;
  * species balance                    =>  mdot (Y_in,k - Y_k) + V wdot_k W_k = 0;
  * energy='off'                       =>  T = T0 (fixed);
  * energy='on' + dU/dt = 0            =>  h(T, Y) = h_in (inflow enthalpy).

So the steady state is an ALGEBRAIC system. Instead of translating the CVODES
time integration, we march a pseudo-transient constant-pressure CSTR ODE

    dY/dt = (mdot/(V rho)) (Y_in - Y) + wdot W / rho
    dT/dt = (mdot/(V rho)) (h_in - h) / cp            (energy on only)

to its fixed point with damped implicit-Euler/Newton steps and an SER
(switched-evolution-relaxation) pseudo-timestep controller. This ODE has the
same fixed point and is physically stable, so the continuation from the
previous segment's state converges in a handful of Newton iterations. The whole
solve is written over a batch axis: one `lax.while_loop` advances ALL cases,
with converged lanes masked out, so the dense linear algebra stays batched on
the MXU.

Approximate Jacobians are used (exact wdot Jacobian incl. third-body terms,
but secondary d(rho)/dx couplings dropped): they only affect iteration count --
convergence is always declared on the exact residual.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp

from ..kinetics.wdot import wdot, wdot_and_jacobian
from ..mechanism.arrays import MechanismArrays
from ..solvers.linalg import (Factorization, factorize, ns_init_state,
                              ns_refresh_state, ns_solve, solve_factored)
from ..thermo import nasa7


@dataclasses.dataclass(frozen=True)
class SteadyOptions:
    """Per-segment Y accuracy ~1e-6 relative (1e-4 of the 1%-of-profile
    target even after 800-segment accumulation). Tighter tolerances are
    unreachable on TPU where emulated f64 puts a noise floor of ~1e2-1e3
    weighted-residual units under the Newton iteration; on CPU the golden
    Cantera anchors (tests/test_golden_eon.py) hold at this setting."""

    rtol: float = 1e-6
    atol_Y: float = 1e-11
    max_iters: int = 120
    dtau0_frac: float = 0.1  # initial pseudo-step as a fraction of t_res
    dtau_growth: float = 15.0  # multiplicative growth on accepted steps
    dtau_shrink: float = 0.25  # backoff on rejected (diverging) steps
    accept_factor: float = 2.0  # tolerate mild transient residual growth
    # cap on CUMULATIVE residual growth: a step is only accepted while
    # gnorm <= best_so_far * diverge_cap. Without this, accept_factor ratchets
    # (gnorm is updated on every accepted step), so a lane can grow its
    # residual 2x per iteration for the whole budget -- observed walking the
    # adiabatic LLNL solve ~800 K down into a spurious quenched basin over a
    # few dozen "accepted" steps (runs/flagship_llnl_eon cases 102/128/...)
    diverge_cap: float = 1e3
    dtau_max_frac: float = 1e8  # effectively pure Newton once large
    jac_refresh_every: int = 2  # modified Newton: rebuild J every k iterations
    dtau_carry_max_frac: float = 1e2  # cap on warm-started dtau (recoverable)
    # plateau handling: a lane whose best residual stopped improving for
    # `stall_iters` iterations has hit its noise floor -- iterating further is
    # wasted work, so the solve STOPS for that lane (returning its best
    # iterate) regardless of the level. Quality is judged separately: the lane
    # reports converged iff its best residual is <= `stall_accept` tolerance
    # units (Y error <= stall_accept * (rtol|Y| + atol)); anything worse flows
    # into PFRTrajectory.max_resid and the stage_simulate f64 rescue.
    stall_iters: int = 10
    stall_accept: float = 100.0
    # "lu": equilibrated f32 LU (XLA; column-sequential, slow at large ns)
    # "nsinv": Newton-Schulz-maintained approximate inverse used as a
    #          Richardson preconditioner -- pure MXU matmuls, the fast path for
    #          the big mechanisms (LLNL/NUIG)
    linear_solver: str = "lu"
    ns_iters: int = 2
    richardson_iters: int = 3
    # allow the expensive LU rescue of the NS preconditioner only on every Kth
    # Jacobian refresh (1 = every refresh). At NUIG conditioning the carried X
    # fails the ||I - A X||_inf < 1 check on nearly every refresh, so K=1 makes
    # the de facto algorithm explicit-LU-inverse per refresh; larger K trades
    # preconditioner quality (extra matmul-cheap Newton iterations) for fewer
    # column-sequential LUs. Non-finite X always rescues regardless of K.
    ns_rescue_every: int = 1
    # panel width for the blocked right-looking LU used by the NS rescue
    # (solvers/linalg.blocked_lu_factor): XLA's TPU LuDecomposition is
    # column-sequential over all n columns, the measured dominant wall-time
    # kernel; blocking factors `lu_panel`-wide panels sequentially and runs
    # each trailing update as one MXU matmul. 0 = use XLA's LU unblocked.
    lu_panel: int = 0
    # factorization used by the NS rescue's explicit inverse: "lu" (f32 LU +
    # two triangular n-RHS solves) or "qr" (Householder QR + ONE triangular
    # solve, R^-1 Q^T -- measured 18.0 vs 20.3 ms at (16, 924, 924) in-graph,
    # scripts/rescue_kernel_micro2.py, and unconditionally stable).
    rescue_kind: str = "lu"
    jac_chunk: int = 8  # batch-chunking of the (chunk, nr, ns) Jacobian build
    # carry the Jacobian/preconditioner ACROSS segments: skip the forced
    # refresh at iteration 0 of a segment whose caller supplied a carried
    # factorization (pfr.py scan). The first step is then modified Newton with
    # the PREVIOUS segment's Jacobian -- continuation makes it an excellent
    # approximation, and most segments converge with ZERO Jacobian builds/NS
    # refreshes (the dominant per-segment kernels). Convergence is still
    # declared on the exact residual; a rejected step forces a refresh.
    carry_jacobian: bool = False
    # matmul precision of the Newton-Schulz preconditioner updates/applies.
    # "default" (bf16 MXU passes) is admissible -- X only needs ~1 digit and
    # convergence is judged on the exact residual -- but MEASURED SLOWER on
    # NUIG B=16: 0.456 traj/s vs 0.481 at "highest" (the cheaper matmuls are
    # offset by extra Newton iterations from the poorer preconditioner)
    ns_precision: str = "highest"
    # matmul precision of the analytic Jacobian build's (nr, ns) contractions
    # (wdot_and_jacobian) -- the FLOP-dominant refresh kernel. None inherits
    # the global default ("highest" in production: 6 bf16 MXU passes);
    # "default" (1 pass) is admissible in principle since J only conditions
    # the Newton direction (residuals use the exact wdot), at the risk of
    # extra iterations. Opt-in pending the TPU A/B.
    jac_precision: str | None = None
    T_min: float = 250.0
    T_max: float = 3500.0
    dT_max: float = 150.0  # per-Newton-step temperature trust region [K]
    # transient-fidelity phase (Eon): the adiabatic CSTR can have MULTIPLE
    # genuine steady branches (h = h_in holds on each); Cantera's
    # advance_to_steady_state lands on the branch the true transient from the
    # inlet flows to, while large-dtau Newton picks a branch unpredictably
    # (observed: the same LLNL segment landing dT=-5.3 K on TPU and -67 K on
    # CPU, both "converged"). Lanes whose INITIAL residual exceeds
    # `transient_resid` (fresh/far-from-steady states; continuation segments
    # sit 1-2 orders below) must first integrate the pseudo-transient
    # faithfully -- dtau capped at `transient_dtau_max` * t_res until
    # `transient_tau` residence times of pseudo-time have accumulated --
    # before the dtau controller is unleashed. This deterministically selects
    # the Cantera-attracting branch at the cost of a few extra iterations on
    # fresh segments only. transient_tau = 0 disables.
    transient_tau: float = 3.0
    transient_dtau_max: float = 0.75
    transient_resid: float = 3e4
    # per-SEGMENT temperature trust region [K]: the steady state of one
    # PFR segment (1/800 of the tube, t_res ~ 1e-4 s) is continuous with its
    # inlet -- healthy per-segment |dT| in the reference data is < 10 K -- so
    # the iterate is confined to T_inlet +- this bound, making distant
    # spurious roots (the 250 K quench branch) unreachable. A lane whose
    # best iterate sits ON the bound cannot satisfy h = h_in there and is
    # reported unconverged (-> f64 rescue). None = unrestricted (standalone
    # CSTR solves, where a large steady-state dT can be the physical answer);
    # the PFR chain driver (pfr.py) substitutes its 250 K continuity bound.
    dT_segment_max: float | None = None


def default_steady_options(dtype) -> "SteadyOptions":
    """dtype-appropriate solver tolerances.

    f32 end-to-end is the validated production path (species profiles agree
    with f64 to ~2e-5 relative-to-peak and the golden Cantera outlet anchor to
    0.035 K over 800 segments -- see VALIDATION.md); its tolerances sit above
    the f32 residual noise floor.
    """
    import jax.numpy as jnp

    if dtype == jnp.float32:
        # nsinv: Newton-Schulz preconditioner carried across segments -- the
        # chain then averages ~1.1 Newton iterations/segment (golden cold-case
        # outlet 865.318 K vs Cantera 865.285 K). carry_jacobian additionally
        # skips the forced per-segment Jacobian rebuild (measured ~6x on the
        # NUIG B=16 bench: 0.48 -> 2.7 traj/s, all lanes converged; f32-vs-f64
        # trajectory agreement unchanged, tests/test_reactors.py)
        # transient-fidelity phase stays ON (same as f64): measured on a
        # 16-case LLNL Eon TPU sweep at production dz = L/800 it costs zero
        # extra iterations (guard lanes finish their capped steps inside the
        # iterations Newton needs anyway) and deterministically selects the
        # transient-attracting branch on fresh multi-branch segments.
        return SteadyOptions(
            rtol=1e-4, atol_Y=1e-9, stall_accept=30.0, stall_iters=8,
            linear_solver="nsinv", carry_jacobian=True,
        )
    return SteadyOptions()


def _rhs_eoff(Y, T0, P0, Y_in, mdot_over_V, arr: MechanismArrays):
    """Pseudo-transient RHS dY/dt for the isothermal (Eoff) segment. (B, ns)."""
    rho = nasa7.density(T0, P0, Y, arr.mw)
    C = rho[:, None] * Y / arr.mw
    w = wdot(T0, P0, C, arr)
    inv_rho = 1.0 / rho
    return (mdot_over_V * inv_rho)[:, None] * (Y_in - Y) + w * arr.mw * inv_rho[:, None]


def _rhs_eon(Y, T, P0, Y_in, h_in, mdot_over_V, arr: MechanismArrays):
    """Pseudo-transient RHS (dY/dt, dT/dt) for the adiabatic (Eon) segment."""
    rho = nasa7.density(T, P0, Y, arr.mw)
    C = rho[:, None] * Y / arr.mw
    w = wdot(T, P0, C, arr)
    inv_rho = 1.0 / rho
    flow = mdot_over_V * inv_rho  # (B,) 1/t_res
    gY = flow[:, None] * (Y_in - Y) + w * arr.mw * inv_rho[:, None]
    h = nasa7.enthalpy_mass(T, Y, arr.mw, arr.nasa_tmid, arr.nasa_coeffs)
    cp = nasa7.cp_mass(T, Y, arr.mw, arr.nasa_tmid, arr.nasa_coeffs)
    gT = flow * (h_in - h) / cp
    return gY, gT


def _jac_YY(T, P0, Y, mdot_over_V, arr: MechanismArrays, chunk: int = 8,
            precision=None):
    """Approximate d(dY/dt)/dY: exact wdot Jacobian + ideal-gas C(Y) chain rule.

    C_i = rho Y_i / W_i with rho = P Wbar/(R T), dC_i/dY_m = rho delta/W_i
    - C_i Wbar/W_m. Returns (J (B, ns, ns), rho, C, w).
    """
    rho = nasa7.density(T, P0, Y, arr.mw)
    C = rho[:, None] * Y / arr.mw
    w, Jw = wdot_and_jacobian(T, P0, C, arr, chunk=chunk, precision=precision)
    wbar = nasa7.mean_molecular_weight(Y, arr.mw)
    inv_rho = 1.0 / rho
    flow = mdot_over_V * inv_rho  # (B,)

    W_k = arr.mw[None, :, None]
    inv_W_m = (1.0 / arr.mw)[None, None, :]
    JwC = jnp.einsum("bki,bi->bk", Jw, C)
    J = (
        W_k * Jw * inv_W_m
        - (W_k[..., 0] * JwC * wbar[:, None])[..., None] * inv_W_m * inv_rho[:, None, None]
    )
    ns = Y.shape[1]
    J = J - flow[:, None, None] * jnp.eye(ns, dtype=Y.dtype)
    return J, rho, C, w


def solve_steady_eoff(
    Y_guess, T0, P0, Y_in, mdot_over_V, arr: MechanismArrays, opts: SteadyOptions,
    dtau0=None, fac0=None, diagJ0=None, has_carry=None,
):
    """Batched steady state of isothermal CSTR segments.

    Args: Y_guess/Y_in (B, ns); T0/P0/mdot_over_V (B,). `dtau0` optionally
    warm-starts the pseudo-timestep controller (pass the previous segment's
    final dtau via info["dtau"]).

    Modified Newton with a CACHED FACTORIZATION: the Jacobian + LU of
    (I/dtau - J) are rebuilt only every `opts.jac_refresh_every` iterations or
    after a rejected step (the LU is the dominant kernel on TPU); in between,
    iterations reuse the factorization -- dtau growth takes effect at the next
    refresh. Convergence is always judged on the exact residual.

    Returns (Y_star (B, ns), info dict with iterations/resid/converged/dtau).
    """
    dtype = Y_guess.dtype
    B, ns = Y_guess.shape
    t_res = 1.0 / (mdot_over_V / nasa7.density(T0, P0, Y_in, arr.mw))  # ~ V rho/mdot

    def resid_norm(g, Y, diagJ):
        # estimated remaining Newton update |g|/|J_kk| vs the Y tolerance: a
        # t_res weighting would demand absurd absolute accuracy of trace
        # radicals whose own relaxation time is orders faster than t_res
        rate = jnp.maximum(jnp.abs(diagJ), (1.0 / t_res)[:, None])
        scale = opts.rtol * jnp.abs(Y) + opts.atol_Y
        return jnp.max(jnp.abs(g) / (rate * scale), axis=1)

    use_ns = opts.linear_solver == "nsinv"

    def build_fac(Y, dtau, prev_fac, nref):
        J, rho, C, w = _jac_YY(T0, P0, Y, mdot_over_V, arr, chunk=opts.jac_chunk,
                               precision=opts.jac_precision)
        A = jnp.eye(ns, dtype=dtype) / dtau[:, None, None] - J
        if use_ns:
            fac, rescued = ns_refresh_state(
                prev_fac, A, ns_iters=opts.ns_iters,
                precision=opts.ns_precision,
                allow_rescue=(nref % opts.ns_rescue_every == 0),
                lu_panel=opts.lu_panel, rescue_kind=opts.rescue_kind)
        else:
            fac, rescued = factorize(A), jnp.ones((), bool)  # LU path: every refresh is an LU
        return fac, jnp.diagonal(J, axis1=1, axis2=2), rescued

    def cond(state):
        return jnp.logical_and(
            state["it"] < opts.max_iters, ~jnp.all(state["done"])
        )

    def body(state):
        refresh = jnp.logical_or(
            jnp.logical_and(
                state["it"] % opts.jac_refresh_every == 0,
                jnp.logical_or(state["it"] > 0, ~state["hascarry"]),
            ),
            state["rejected"],
        )
        fac, diagJ, rescued = jax.lax.cond(
            refresh,
            lambda args: build_fac(*args),
            lambda args: (state["fac"], state["diagJ"], jnp.zeros((), bool)),
            (state["Y"], state["dtau"], state["fac"], state["nref"]),
        )
        delta = (
            ns_solve(fac, state["g"], iters=opts.richardson_iters,
                     precision=opts.ns_precision)
            if use_ns
            else solve_factored(fac, state["g"])
        )
        Y_new = jnp.clip(state["Y"] + delta, 0.0, 1.0)
        Y_new = Y_new / jnp.sum(Y_new, axis=1, keepdims=True)
        g_new = _rhs_eoff(Y_new, T0, P0, Y_in, mdot_over_V, arr)
        gnorm_new = resid_norm(g_new, Y_new, diagJ)
        # accept/reject controller: grow dtau aggressively while the residual
        # is non-increasing, back off (and force a refactor) when it diverges;
        # the best-so-far cap stops accept_factor from ratcheting the lane
        # arbitrarily far from the continuation basin
        accept = gnorm_new <= jnp.minimum(
            state["gnorm"] * opts.accept_factor, state["best"] * opts.diverge_cap
        )
        dtau_new = jnp.where(
            accept, state["dtau"] * opts.dtau_growth, state["dtau"] * opts.dtau_shrink
        )
        dtau_new = jnp.clip(dtau_new, 1e-12 * t_res, opts.dtau_max_frac * t_res)
        gnorm_next = jnp.where(accept, gnorm_new, state["gnorm"])
        # "progress" = a meaningfully new best (>=5%)
        improved = gnorm_next < state["best"] * 0.95
        best_new = jnp.minimum(state["best"], gnorm_next)
        # plateau-stop: stall_iters ACCEPTED Newton-regime steps without
        # progress means the lane bounces in its noise floor -- stop, whatever
        # the level; quality is judged on `best` at return
        # (SteadyOptions.stall_accept). Two situations that look like "no
        # progress" but are NOT a noise floor never accumulate evidence:
        # the PTC transient ramp (dtau < t_res resets the counter -- slow
        # residual progress there is expected), and rejected steps (the
        # controller searching for a workable dtau freezes the counter).
        # Observed: a fresh JetSurf segment killed mid reject-cycle at resid
        # 4.5e3 that converges to 0.8 at iteration 32 under either naive rule.
        in_ramp = state["dtau"] < t_res
        bad_new = jnp.where(
            jnp.logical_or(improved, in_ramp),
            0,
            jnp.where(accept, state["bad"] + 1, state["bad"]),
        )
        stalled = bad_new >= opts.stall_iters
        newly_done = jnp.logical_or(
            jnp.logical_and(accept, gnorm_new <= 1.0), stalled
        )
        done = state["done"]
        advance = jnp.logical_and(accept, ~done)
        # best-residual iterate: what the solve RETURNS. An unconverged lane
        # hands its best state (not wherever the iteration budget left it) to
        # the next segment, bounding the damage of any residual-growing walk.
        new_best = jnp.logical_and(advance, gnorm_new < state["best"])
        return {
            "Y": jnp.where(advance[:, None], Y_new, state["Y"]),
            "Ybest": jnp.where(new_best[:, None], Y_new, state["Ybest"]),
            "g": jnp.where(advance[:, None], g_new, state["g"]),
            "fac": fac,
            "diagJ": diagJ,
            "dtau": jnp.where(done, state["dtau"], dtau_new),
            "gnorm": jnp.where(advance, gnorm_new, state["gnorm"]),
            "best": jnp.where(done, state["best"], best_new),
            "bad": jnp.where(done, state["bad"], bad_new),
            "it": state["it"] + 1,
            "nref": state["nref"] + refresh.astype(jnp.int32),
            "nresc": state["nresc"] + rescued.astype(jnp.int32),
            "rejected": jnp.any(jnp.logical_and(~accept, ~done)),
            "done": jnp.logical_or(done, newly_done),
            "hascarry": state["hascarry"],
        }

    if dtau0 is None:
        dtau0 = jnp.full((B,), 1.0, dtype) * opts.dtau0_frac * t_res
    g0 = _rhs_eoff(Y_guess, T0, P0, Y_in, mdot_over_V, arr)
    # conservative initial norm (rate floor 1/t_res): a runaway first step must
    # NOT be blindly accepted -- an inf baseline lets one catastrophic Newton
    # step land in a spurious basin (observed: adiabatic T escaping to T_max)
    gnorm0 = resid_norm(g0, Y_guess, jnp.zeros((B, ns), dtype))
    dummy_fac = (
        (fac0 if fac0 is not None else ns_init_state(B, ns, dtype))
        if use_ns
        else Factorization(
            lu=jnp.zeros((B, ns, ns), jnp.float32),
            piv=jnp.zeros((B, ns), jnp.int32),
            row_scale=jnp.ones((B, ns), dtype),
            col_scale=jnp.ones((B, ns), dtype),
            A=jnp.zeros((B, ns, ns), dtype),
        )
    )
    state0 = {
        "Y": Y_guess,
        "Ybest": Y_guess,
        "g": g0,
        "fac": dummy_fac,
        "diagJ": diagJ0 if diagJ0 is not None else jnp.ones((B, ns), dtype),
        "dtau": jnp.clip(dtau0, 1e-12 * t_res, opts.dtau_max_frac * t_res),
        "gnorm": gnorm0,
        "best": jnp.full((B,), jnp.inf, dtype),
        "bad": jnp.zeros((B,), jnp.int32),
        "it": jnp.zeros((), jnp.int32),
        "nref": jnp.zeros((), jnp.int32),
        "nresc": jnp.zeros((), jnp.int32),
        "rejected": jnp.zeros((), bool),
        "done": jnp.zeros((B,), bool),
        "hascarry": (
            jnp.asarray(has_carry, bool)
            if has_carry is not None
            else jnp.zeros((), bool)
        ),
    }
    out = jax.lax.while_loop(cond, body, state0)
    resid = jnp.minimum(out["best"], out["gnorm"])
    return out["Ybest"], {
        "iterations": out["it"],
        "jac_refreshes": out["nref"],
        "prec_rescues": out["nresc"],
        "resid": resid,
        "converged": resid <= opts.stall_accept,
        "dtau": out["dtau"],
        # carried NS preconditioner (None for "lu"): seeding the NEXT segment's
        # solve with this avoids the bootstrap LU rescue there (continuation:
        # successive segment Jacobians differ little)
        "fac": out["fac"] if use_ns else None,
        "diagJ": out["diagJ"],
    }


def solve_steady_eon(
    Y_guess, T_guess, P0, Y_in, h_in, mdot_over_V, arr: MechanismArrays, opts: SteadyOptions,
    dtau0=None, fac0=None, diagJ0=None, has_carry=None,
):
    """Batched steady state of adiabatic CSTR segments (unknowns Y and T).

    Cached-factorization modified Newton as in solve_steady_eoff.
    Returns (Y_star, T_star, info).
    """
    dtype = Y_guess.dtype
    B, ns = Y_guess.shape
    n = ns + 1
    t_res = 1.0 / (mdot_over_V / nasa7.density(T_guess, P0, Y_in, arr.mw))

    def rhs(Y, T):
        gY, gT = _rhs_eon(Y, T, P0, Y_in, h_in, mdot_over_V, arr)
        return jnp.concatenate([gY, gT[:, None]], axis=1)

    def resid_norm(g, Y, T, diagJ):
        rate = jnp.maximum(jnp.abs(diagJ), (1.0 / t_res)[:, None])
        sY = opts.rtol * jnp.abs(Y) + opts.atol_Y
        nY = jnp.max(jnp.abs(g[:, :ns]) / (rate * sY), axis=1)
        sT = opts.rtol * T
        nT = jnp.abs(g[:, ns]) * t_res / sT
        return jnp.maximum(nY, nT)

    # scale the T slot so the damping matrix is well conditioned: the T unknown
    # is O(1000 K) while Y is O(1); solve in x_scaled = [Y, T/T_scale]
    T_scale = jnp.asarray(1000.0, dtype)
    D = jnp.ones((n,), dtype).at[ns].set(T_scale)

    # per-segment trust region anchored at the segment INLET temperature
    # (= T_guess in the pfr continuation): see SteadyOptions.dT_segment_max
    dT_seg = jnp.inf if opts.dT_segment_max is None else opts.dT_segment_max
    T_lo = jnp.maximum(T_guess - dT_seg, opts.T_min)
    T_hi = jnp.minimum(T_guess + dT_seg, opts.T_max)

    use_ns = opts.linear_solver == "nsinv"

    def build_fac(Y, T, dtau, prev_fac, nref):
        J_YY, rho, C, w = _jac_YY(T, P0, Y, mdot_over_V, arr, chunk=opts.jac_chunk,
                                  precision=opts.jac_precision)
        inv_rho = 1.0 / rho
        flow = mdot_over_V * inv_rho
        gY = flow[:, None] * (Y_in - Y) + w * arr.mw * inv_rho[:, None]
        cp = nasa7.cp_mass(T, Y, arr.mw, arr.nasa_tmid, arr.nasa_coeffs)

        # dwdot/dT at fixed (Y, P): direct T dependence + dC/dT = -C/T.
        # Forward difference of the clip-guarded primal, NOT jax.jvp: the jvp
        # tangent of exp(clip(expo, 85)) overflows f32 to NaN for LLNL-sized
        # rate exponents (tangent = exp(expo)*d_expo accumulates past 3.4e38
        # in the stoichiometric sum), which poisoned every Eon Jacobian and
        # froze the LLNL Eon solve. The primal-only difference stays inside
        # the exp clip; sqrt(f32 eps)-relative step, plenty for a modified-
        # Newton matrix.
        f_T = lambda t: wdot(
            t, P0, (nasa7.density(t, P0, Y, arr.mw)[:, None] * Y / arr.mw), arr
        )
        dT_fd = 4e-4 * T
        dw_dT = (f_T(T + dT_fd) - w) / dT_fd[:, None]
        J_YT = gY / T[:, None] + dw_dT * arr.mw * inv_rho[:, None]  # (B, ns)

        # species partial enthalpies per unit mass fraction [J/kg]
        hk = (
            nasa7.h_RT(T, arr.nasa_tmid, arr.nasa_coeffs)
            * (8314.462618 * T[:, None])
            / arr.mw
        )
        J_TY = -(flow / cp)[:, None] * hk  # (B, ns)
        J_TT = -flow  # dominant d gT/dT

        J = jnp.zeros((B, n, n), dtype)
        J = J.at[:, :ns, :ns].set(J_YY)
        J = J.at[:, :ns, ns].set(J_YT)
        J = J.at[:, ns, :ns].set(J_TY)
        J = J.at[:, ns, ns].set(J_TT)
        Js = J * D[None, None, :]
        A = jnp.eye(n, dtype=dtype) / dtau[:, None, None] - Js
        if use_ns:
            fac, rescued = ns_refresh_state(
                prev_fac, A, ns_iters=opts.ns_iters,
                precision=opts.ns_precision,
                allow_rescue=(nref % opts.ns_rescue_every == 0),
                lu_panel=opts.lu_panel, rescue_kind=opts.rescue_kind)
        else:
            fac, rescued = factorize(A), jnp.ones((), bool)
        return fac, jnp.diagonal(J_YY, axis1=1, axis2=2), rescued

    def cond(state):
        return jnp.logical_and(state["it"] < opts.max_iters, ~jnp.all(state["done"]))

    def body(state):
        refresh = jnp.logical_or(
            jnp.logical_and(
                state["it"] % opts.jac_refresh_every == 0,
                jnp.logical_or(state["it"] > 0, ~state["hascarry"]),
            ),
            state["rejected"],
        )
        fac, diagJ, rescued = jax.lax.cond(
            refresh,
            lambda args: build_fac(*args),
            lambda args: (state["fac"], state["diagJ"], jnp.zeros((), bool)),
            (state["Y"], state["T"], state["dtau"], state["fac"], state["nref"]),
        )
        delta = (
            ns_solve(fac, state["g"], iters=opts.richardson_iters,
                     precision=opts.ns_precision)
            if use_ns
            else solve_factored(fac, state["g"])
        ) * D[None, :]
        Y_new = jnp.clip(state["Y"] + delta[:, :ns], 0.0, 1.0)
        Y_new = Y_new / jnp.sum(Y_new, axis=1, keepdims=True)
        # trust region: a single segment never moves T by hundreds of K; an
        # unguarded step can jump to a spurious high-T basin
        dT = jnp.clip(delta[:, ns], -opts.dT_max, opts.dT_max)
        T_new = jnp.clip(state["T"] + dT, T_lo, T_hi)
        g_new = rhs(Y_new, T_new)
        gnorm_new = resid_norm(g_new, Y_new, T_new, diagJ)
        accept = gnorm_new <= jnp.minimum(
            state["gnorm"] * opts.accept_factor, state["best"] * opts.diverge_cap
        )
        dtau_new = jnp.where(
            accept, state["dtau"] * opts.dtau_growth, state["dtau"] * opts.dtau_shrink
        )
        dtau_new = jnp.clip(dtau_new, 1e-12 * t_res, opts.dtau_max_frac * t_res)
        # transient-fidelity phase: keep far-from-steady lanes on small,
        # transient-resolving steps until enough pseudo-time has accumulated
        in_tr = jnp.logical_and(need_tr, state["tau"] < opts.transient_tau)
        dtau_new = jnp.where(
            in_tr, jnp.minimum(dtau_new, opts.transient_dtau_max * t_res), dtau_new
        )
        gnorm_next = jnp.where(accept, gnorm_new, state["gnorm"])
        # "progress" = a meaningfully new best (>=5%); demanding a large
        # per-step improvement here would plateau-stop lanes that are
        # converging slowly but genuinely (observed: a fresh JetSurf
        # segment killed at resid 4.5e3 with a 30% criterion)
        improved = gnorm_next < state["best"] * 0.95
        best_new = jnp.minimum(state["best"], gnorm_next)
        # plateau-stop on accepted Newton-regime steps only (see the Eoff
        # body); the PTC ramp and the transient-fidelity phase reset the
        # counter, rejected steps freeze it
        in_ramp = state["dtau"] < t_res
        bad_new = jnp.where(
            jnp.logical_or(improved, jnp.logical_or(in_tr, in_ramp)),
            0,
            jnp.where(accept, state["bad"] + 1, state["bad"]),
        )
        stalled = bad_new >= opts.stall_iters
        newly_done = jnp.logical_or(jnp.logical_and(accept, gnorm_new <= 1.0), stalled)
        done = state["done"]
        advance = jnp.logical_and(accept, ~done)
        new_best = jnp.logical_and(advance, gnorm_new < state["best"])
        return {
            "Y": jnp.where(advance[:, None], Y_new, state["Y"]),
            "T": jnp.where(advance, T_new, state["T"]),
            "Ybest": jnp.where(new_best[:, None], Y_new, state["Ybest"]),
            "Tbest": jnp.where(new_best, T_new, state["Tbest"]),
            "tau": jnp.where(
                advance, state["tau"] + state["dtau"] / t_res, state["tau"]
            ),
            "g": jnp.where(advance[:, None], g_new, state["g"]),
            "fac": fac,
            "diagJ": diagJ,
            "dtau": jnp.where(done, state["dtau"], dtau_new),
            "gnorm": jnp.where(advance, gnorm_new, state["gnorm"]),
            "best": jnp.where(done, state["best"], best_new),
            "bad": jnp.where(done, state["bad"], bad_new),
            "it": state["it"] + 1,
            "nref": state["nref"] + refresh.astype(jnp.int32),
            "nresc": state["nresc"] + rescued.astype(jnp.int32),
            "rejected": jnp.any(jnp.logical_and(~accept, ~done)),
            "done": jnp.logical_or(done, newly_done),
            "hascarry": state["hascarry"],
        }

    if dtau0 is None:
        dtau0 = jnp.full((B,), 1.0, dtype) * opts.dtau0_frac * t_res
    g0 = rhs(Y_guess, T_guess)
    gnorm0 = resid_norm(g0, Y_guess, T_guess, jnp.zeros((B, ns), dtype))
    # lanes needing the transient-fidelity phase (see SteadyOptions); the
    # warm-started dtau is clamped so the phase starts on resolving steps
    need_tr = (
        gnorm0 > opts.transient_resid
        if opts.transient_tau > 0
        else jnp.zeros((B,), bool)
    )
    dtau0 = jnp.where(
        need_tr, jnp.minimum(dtau0, opts.transient_dtau_max * t_res), dtau0
    )
    dummy_fac = (
        (fac0 if fac0 is not None else ns_init_state(B, n, dtype))
        if use_ns
        else Factorization(
            lu=jnp.zeros((B, n, n), jnp.float32),
            piv=jnp.zeros((B, n), jnp.int32),
            row_scale=jnp.ones((B, n), dtype),
            col_scale=jnp.ones((B, n), dtype),
            A=jnp.zeros((B, n, n), dtype),
        )
    )
    state0 = {
        "Y": Y_guess,
        "T": T_guess,
        "Ybest": Y_guess,
        "Tbest": T_guess,
        "tau": jnp.zeros((B,), dtype),
        "g": g0,
        "fac": dummy_fac,
        "diagJ": diagJ0 if diagJ0 is not None else jnp.ones((B, ns), dtype),
        "dtau": jnp.clip(dtau0, 1e-12 * t_res, opts.dtau_max_frac * t_res),
        "gnorm": gnorm0,
        "best": jnp.full((B,), jnp.inf, dtype),
        "bad": jnp.zeros((B,), jnp.int32),
        "it": jnp.zeros((), jnp.int32),
        "nref": jnp.zeros((), jnp.int32),
        "nresc": jnp.zeros((), jnp.int32),
        "rejected": jnp.zeros((), bool),
        "done": jnp.zeros((B,), bool),
        "hascarry": (
            jnp.asarray(has_carry, bool)
            if has_carry is not None
            else jnp.zeros((), bool)
        ),
    }
    out = jax.lax.while_loop(cond, body, state0)
    resid = jnp.minimum(out["best"], out["gnorm"])
    return out["Ybest"], out["Tbest"], {
        "iterations": out["it"],
        "jac_refreshes": out["nref"],
        "prec_rescues": out["nresc"],
        "resid": resid,
        "converged": resid <= opts.stall_accept,
        "dtau": out["dtau"],
        "fac": out["fac"] if use_ns else None,
        "diagJ": out["diagJ"],
    }

"""Lagrangian chain-of-CSTRs PFR driver: `lax.scan` over segments, batched over cases.

Re-implements (TPU-natively) the reference ground-truth engine
`run_simulation` (CRNN_TEMP_PRED_MODEL_TRAINING_DATASET_GENERATION/
simul_data_gene_fix_chain_2D.py:47-226): a reactor of volume A*dz is marched
down the tube; at each of `n_steps` segments the upstream reservoir is synced to
the previous state and the reactor is driven to steady state. Residence time
and velocity bookkeeping match :162-171:
    t_r[n] = m / mdot = rho V / mdot ,   u[n] = mdot / (A rho),
    t[n] = cumulative sum of t_r.

Instead of 3 sequential Cantera networks per Python process, the whole
(cases x segments) sweep is ONE jitted computation: `lax.scan` carries (Y, T)
across segments and each scan step solves the steady state for the entire batch
of cases at once (reactors/cstr.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..mechanism.arrays import MechanismArrays
from ..thermo import nasa7
from .cstr import SteadyOptions, default_steady_options, solve_steady_eoff, solve_steady_eon

# Reference reactor geometry defaults (simul_data_gene_fix_chain_2D.py:40-44)
DEFAULT_LENGTH = 1.0  # [m]
DEFAULT_U0 = 2.5  # [m/s]
DEFAULT_DIAMETER = 0.05  # [m]
DEFAULT_N_STEPS = 800
FEED_COMPOSITION = "NC6H14:1.0, H2O:0.7"  # by mass (:38)

# The 9 lumped species tracked in the trajectory files (:206-208); JetSurf uses
# different names for two of them (:207).
TRACKED_SPECIES = ["H2", "CH4", "C2H4", "C2H6", "C3H6", "C4H8-1", "NC6H14", "C4H10", "C5H10-1"]
TRACKED_SPECIES_JETSURF = ["H2", "CH4", "C2H4", "C2H6", "C3H6", "C4H81", "NC6H14", "C4H10", "C5H10"]


def tracked_indices(species_names) -> list[int]:
    names = TRACKED_SPECIES_JETSURF if "C4H81" in species_names else TRACKED_SPECIES
    return [list(species_names).index(s) for s in names]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PFRTrajectory:
    """Batched PFR solution on the (n_steps+1)-point grid (index 0 = inlet)."""

    t: jax.Array  # (B, n+1) cumulative residence time [s]
    T: jax.Array  # (B, n+1) [K]
    P: jax.Array  # (B, n+1) [Pa]
    Y: jax.Array  # (B, n+1, ns) mass fractions
    rho: jax.Array  # (B, n+1) [kg/m^3]
    u: jax.Array  # (B, n+1) velocity [m/s]
    z: jax.Array  # (B, n+1) axial position [m]
    converged: jax.Array  # (B,) all segments converged
    newton_iters: jax.Array  # (n,) solver iterations per segment (diagnostics)
    # (n,) Jacobian-build + preconditioner-refresh count per segment, and the
    # subset that fell back to the column-sequential LU rescue. Together with
    # newton_iters these determine the solve's matmul FLOPs exactly
    # (bench.py pfr_flop_model), enabling achieved-FLOP/s / MFU accounting.
    jac_refreshes: jax.Array
    prec_rescues: jax.Array
    # (B,) worst per-segment residual in tolerance units (1.0 = converged to
    # rtol; stall-accepted lanes sit above 1). Drives the f64 rescue pass in
    # stage_simulate: only cases whose residual implies a real accuracy loss
    # are re-solved.
    max_resid: jax.Array

    def concentrations(self, arr: MechanismArrays):
        """Molar concentrations [kmol/m^3], shape (B, n+1, ns)."""
        return self.rho[..., None] * self.Y / arr.mw


def simulate_pfr(
    arr: MechanismArrays,
    T0,
    P0,
    *,
    Y_feed=None,
    length=DEFAULT_LENGTH,
    u0=DEFAULT_U0,
    n_steps=DEFAULT_N_STEPS,
    energy_on: bool = False,
    opts: SteadyOptions | None = None,
    species_names=None,
    start_state=None,
    return_state: bool = False,
    project_tracked=None,
):
    """Simulate the PFR chain for a batch of inlet conditions.

    Args:
      T0, P0: (B,) inlet temperature [K] / pressure [Pa].
      Y_feed: (ns,) or (B, ns) feed mass fractions; defaults to the reference's
        'NC6H14:1.0, H2O:0.7' (requires species_names).
      length, u0: scalars or (B,) per-case geometry (4D sweeps).
      energy_on: False = isothermal (Eoff), True = adiabatic (Eon).
      start_state: optional (Y, T, dtau) tuple to resume marching mid-reactor
        (window execution); mdot is always computed from the TRUE inlet feed.
      return_state: also return the final (Y, T, dtau) for chaining windows.
      project_tracked: optional (k,) species indices. When given, the returned
        trajectory's Y field holds the MOLAR CONCENTRATIONS [kmol/m^3] of just
        those species (shape (B, n+1, k)) instead of all-species mass
        fractions -- projected ON DEVICE so a sweep ships ~k/ns of the data
        to the host. Measured: the NUIG (924-species) production sweep is
        BOUND by the device->host tunnel transfer of the full Y history
        (~95 MB per 32-case chunk), not by compute; the 9 tracked species
        are all the trajectory txt artifacts ever use (reference
        simul_data_gene_fix_chain_2D.py:206-208). `concentrations()` must
        not be called on a projected trajectory.

    Returns PFRTrajectory (and the final state when return_state). Fully
    jittable; wrap in jax.jit for production use.
    """
    opts = opts or default_steady_options(arr.dtype)
    if opts.dT_segment_max is None:
        # chain continuity bound: one segment (1/800 of the tube) cannot move
        # T by hundreds of K; confining each segment solve to T_in +- 250 K
        # makes the spurious quenched branch unreachable (see SteadyOptions)
        opts = dataclasses.replace(opts, dT_segment_max=250.0)
    dtype = arr.dtype
    T0 = jnp.asarray(T0, dtype)
    P0 = jnp.asarray(P0, dtype)
    B = T0.shape[0]
    if Y_feed is None:
        if species_names is None:
            raise ValueError("species_names required to build the default feed")
        Y_feed = nasa7.mass_fractions_from_composition_string(
            FEED_COMPOSITION, species_names, arr.mw
        )
    Y_feed = jnp.broadcast_to(jnp.asarray(Y_feed, dtype), (B, arr.n_species))
    length = jnp.broadcast_to(jnp.asarray(length, dtype), (B,))
    u0 = jnp.broadcast_to(jnp.asarray(u0, dtype), (B,))

    dz = length / n_steps
    rho0 = nasa7.density(T0, P0, Y_feed, arr.mw)
    # mdot/V = rho0 u0 A / (A dz); area cancels everywhere
    mdot_over_V = rho0 * u0 / dz
    mdot_over_A = rho0 * u0

    # characteristic residence scale for the warm-start dtau cap
    t_res0 = rho0 / mdot_over_V

    if start_state is not None:
        Y_start, T_start, dtau_start = start_state
        Y_start = jnp.asarray(Y_start, dtype)
        T_start = jnp.asarray(T_start, dtype)
        dtau_start = jnp.asarray(dtau_start, dtype)
    else:
        Y_start, T_start = Y_feed, T0
        dtau_start = jnp.full((B,), opts.dtau0_frac, dtype) * t_res0

    # the NS preconditioner is CARRIED across segments: successive segment
    # Jacobians differ only by the per-segment state increment (continuation),
    # so the previous segment's inverse is an excellent NS seed and the
    # column-sequential LU rescue fires only when conditioning genuinely
    # defeats Newton-Schulz -- not (as a per-segment cold X would force) on
    # every segment's first refresh
    use_ns = opts.linear_solver == "nsinv"
    n_sys = arr.n_species + 1 if energy_on else arr.n_species
    from ..solvers.linalg import ns_init_state

    fac_start = ns_init_state(B, n_sys, dtype) if use_ns else None
    # carry_jacobian: skip the forced Jacobian refresh at iteration 0 of every
    # segment after the first -- the carried preconditioner (built from the
    # previous segment's Jacobian) drives a modified-Newton step, and most
    # segments converge with zero Jacobian builds (see SteadyOptions)
    carry_jac = opts.carry_jacobian and use_ns
    diagJ_start = jnp.zeros((B, arr.n_species), dtype) if carry_jac else None
    hc_start = jnp.zeros((), bool) if carry_jac else None

    if project_tracked is not None:
        tr_idx = jnp.asarray(project_tracked)
        mw_tr = arr.mw[tr_idx]
        proj = lambda Y, rho: rho[:, None] * Y[:, tr_idx] / mw_tr
    else:
        proj = lambda Y, rho: Y

    def segment(carry, _):
        Y_prev, T_prev, dtau_prev, fac_prev, diagJ_prev, hc_prev = carry
        dtau0 = jnp.minimum(dtau_prev, opts.dtau_carry_max_frac * t_res0)
        kw = dict(dtau0=dtau0, fac0=fac_prev)
        if carry_jac:
            kw.update(diagJ0=diagJ_prev, has_carry=hc_prev)
        if energy_on:
            h_in = nasa7.enthalpy_mass(T_prev, Y_prev, arr.mw, arr.nasa_tmid, arr.nasa_coeffs)
            Y, T, info = solve_steady_eon(
                Y_prev, T_prev, P0, Y_prev, h_in, mdot_over_V, arr, opts, **kw
            )
        else:
            Y, info = solve_steady_eoff(
                Y_prev, T0, P0, Y_prev, mdot_over_V, arr, opts, **kw
            )
            T = T_prev
        rho = nasa7.density(T, P0, Y, arr.mw)
        t_r = rho / mdot_over_V  # rho V / mdot
        u = mdot_over_A / rho
        diagJ_next = info["diagJ"] if carry_jac else None
        hc_next = jnp.ones((), bool) if carry_jac else None
        return (Y, T, info["dtau"], info["fac"], diagJ_next, hc_next), (
            proj(Y, rho), T, rho, t_r, u, info["converged"], info["iterations"],
            info["jac_refreshes"], info["prec_rescues"], info["resid"]
        )

    (Yf, Tf, dtau_f, _, _, _), (Ys, Ts, rhos, trs, us, convs, iters, nrefs,
                                nrescs, resids) = jax.lax.scan(
        segment,
        (Y_start, T_start, dtau_start, fac_start, diagJ_start, hc_start),
        None, length=n_steps,
    )
    # stack the window's inlet state as grid point 0
    rho_start = nasa7.density(T_start, P0, Y_start, arr.mw)
    Y_all = jnp.concatenate([proj(Y_start, rho_start)[None], Ys], axis=0)  # (n+1, B, ns|k)
    T_all = jnp.concatenate([T_start[None], Ts], axis=0)
    rho_all = jnp.concatenate([rho_start[None], rhos], axis=0)
    u_all = jnp.concatenate([(mdot_over_A / rho_start)[None], us], axis=0)
    t_all = jnp.concatenate([jnp.zeros((1, B), dtype), jnp.cumsum(trs, axis=0)], axis=0)

    # (B, n+1, ...) layout
    to_b = lambda x: jnp.moveaxis(x, 0, 1)
    n1 = n_steps + 1
    z = jnp.linspace(0.0, 1.0, n1, dtype=dtype)[None, :] * length[:, None]
    traj = PFRTrajectory(
        t=to_b(t_all),
        T=to_b(T_all),
        P=jnp.broadcast_to(P0[:, None], (B, n1)),
        Y=to_b(Y_all),
        rho=to_b(rho_all),
        u=to_b(u_all),
        z=z,
        converged=jnp.all(convs, axis=0),
        newton_iters=iters,
        jac_refreshes=nrefs,
        prec_rescues=nrescs,
        max_resid=jnp.max(resids, axis=0),
    )
    if return_state:
        return traj, (Yf, Tf, dtau_f)
    return traj


def make_windowed_step(arr, *, window, n_steps, energy_on=False, opts=None,
                       species_names=None, Y_feed=None, project_tracked=None):
    """One jitted window-advance fn, reusable across simulate_pfr_windowed
    calls (a sweep re-jitting per chunk would re-trace the big-mechanism graph
    every chunk)."""
    opts = opts or default_steady_options(arr.dtype)

    def step(T0, P0, L, U, Yf, state):
        return simulate_pfr(
            arr, T0, P0, Y_feed=Yf, n_steps=window,
            length=L * window / n_steps, u0=U,
            energy_on=energy_on, opts=opts, species_names=species_names,
            start_state=state, return_state=True,
            project_tracked=project_tracked,
        )

    return jax.jit(step)


def simulate_pfr_windowed(
    arr: MechanismArrays,
    T0,
    P0,
    *,
    window: int = 100,
    n_steps=DEFAULT_N_STEPS,
    length=DEFAULT_LENGTH,
    u0=DEFAULT_U0,
    energy_on: bool = False,
    opts: SteadyOptions | None = None,
    species_names=None,
    Y_feed=None,
    step_fn=None,
    project_tracked=None,
):
    """Run the chain as sequential jitted windows of `window` segments.

    Keeps each device execution short (this environment's TPU tunnel kills
    executions running longer than ~1-2 minutes) and gives natural progress/
    checkpoint boundaries. Numerically identical to one long scan up to the
    dtau warm-start at window joins.
    """
    import numpy as np

    assert n_steps % window == 0, "n_steps must be a multiple of window"
    opts = opts or default_steady_options(arr.dtype)
    dtype = arr.dtype
    T0 = jnp.asarray(T0, dtype)
    P0 = jnp.asarray(P0, dtype)
    B = T0.shape[0]
    if Y_feed is None:
        Y_feed = nasa7.mass_fractions_from_composition_string(
            FEED_COMPOSITION, species_names, arr.mw
        )
    Y_feed = jnp.broadcast_to(jnp.asarray(Y_feed, dtype), (B, arr.n_species))
    length_b = jnp.broadcast_to(jnp.asarray(length, dtype), (B,))
    u0_b = jnp.broadcast_to(jnp.asarray(u0, dtype), (B,))
    rho0 = nasa7.density(T0, P0, Y_feed, arr.mw)
    t_res0 = rho0 / (rho0 * u0_b / (length_b / n_steps))
    state = (Y_feed, T0, jnp.full((B,), opts.dtau0_frac, dtype) * t_res0)

    fn = step_fn or make_windowed_step(
        arr, window=window, n_steps=n_steps, energy_on=energy_on, opts=opts,
        species_names=species_names, project_tracked=project_tracked,
    )
    parts = []
    for w in range(n_steps // window):
        traj, state = jax.block_until_ready(fn(T0, P0, length_b, u0_b, Y_feed, state))
        parts.append(traj)
    return _stitch_windows(parts, np.asarray(length_b), n_steps)


def _stitch_windows(parts, length, n_steps):
    """Concatenate window trajectories into one PFRTrajectory."""
    import numpy as np

    B = parts[0].t.shape[0]
    t_off = np.zeros(B)
    ts, Ts, Ys, rhos, us = [], [], [], [], []
    convs = []
    iters = []
    nrefs = []
    nrescs = []
    resids = []
    for i, p in enumerate(parts):
        sl = slice(None) if i == 0 else slice(1, None)
        ts.append(np.asarray(p.t)[:, sl] + t_off[:, None])
        Ts.append(np.asarray(p.T)[:, sl])
        Ys.append(np.asarray(p.Y)[:, sl])
        rhos.append(np.asarray(p.rho)[:, sl])
        us.append(np.asarray(p.u)[:, sl])
        convs.append(np.asarray(p.converged))
        iters.append(np.asarray(p.newton_iters))
        nrefs.append(np.asarray(p.jac_refreshes))
        nrescs.append(np.asarray(p.prec_rescues))
        resids.append(np.asarray(p.max_resid))
        t_off = t_off + np.asarray(p.t)[:, -1]
    n1 = n_steps + 1
    z = np.linspace(0.0, 1.0, n1)[None, :] * np.atleast_1d(length)[:, None]
    return PFRTrajectory(
        t=np.concatenate(ts, axis=1),
        T=np.concatenate(Ts, axis=1),
        P=np.broadcast_to(np.asarray(parts[0].P)[:, :1], (B, n1)).copy(),
        Y=np.concatenate(Ys, axis=1),
        rho=np.concatenate(rhos, axis=1),
        u=np.concatenate(us, axis=1),
        z=np.broadcast_to(z, (B, n1)).copy(),
        converged=np.logical_and.reduce(convs),
        newton_iters=np.concatenate(iters),
        jac_refreshes=np.concatenate(nrefs),
        prec_rescues=np.concatenate(nrescs),
        max_resid=np.maximum.reduce(resids),
    )

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
):
    """Simulate the PFR chain for a batch of inlet conditions.

    Args:
      T0, P0: (B,) inlet temperature [K] / pressure [Pa].
      Y_feed: (ns,) or (B, ns) feed mass fractions; defaults to the reference's
        'NC6H14:1.0, H2O:0.7' (requires species_names).
      length, u0: scalars or (B,) per-case geometry (4D sweeps).
      energy_on: False = isothermal (Eoff), True = adiabatic (Eon).

    Returns PFRTrajectory. Fully jittable; wrap in jax.jit for production use.
    """
    opts = opts or default_steady_options(arr.dtype)
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

    def segment(carry, _):
        Y_prev, T_prev, dtau_prev = carry
        dtau0 = jnp.minimum(dtau_prev, opts.dtau_carry_max_frac * t_res0)
        if energy_on:
            h_in = nasa7.enthalpy_mass(T_prev, Y_prev, arr.mw, arr.nasa_tmid, arr.nasa_coeffs)
            Y, T, info = solve_steady_eon(
                Y_prev, T_prev, P0, Y_prev, h_in, mdot_over_V, arr, opts, dtau0=dtau0
            )
        else:
            Y, info = solve_steady_eoff(
                Y_prev, T0, P0, Y_prev, mdot_over_V, arr, opts, dtau0=dtau0
            )
            T = T_prev
        rho = nasa7.density(T, P0, Y, arr.mw)
        t_r = rho / mdot_over_V  # rho V / mdot
        u = mdot_over_A / rho
        return (Y, T, info["dtau"]), (Y, T, rho, t_r, u, info["converged"], info["iterations"])

    dtau_init = jnp.full((B,), opts.dtau0_frac, dtype) * t_res0
    (Yf, Tf, _), (Ys, Ts, rhos, trs, us, convs, iters) = jax.lax.scan(
        segment, (Y_feed, T0, dtau_init), None, length=n_steps
    )
    # stack the inlet state as grid point 0
    Y_all = jnp.concatenate([Y_feed[None], Ys], axis=0)  # (n+1, B, ns)
    T_all = jnp.concatenate([T0[None], Ts], axis=0)
    rho_all = jnp.concatenate([rho0[None], rhos], axis=0)
    u_all = jnp.concatenate([u0[None], us], axis=0)
    t_all = jnp.concatenate([jnp.zeros((1, B), dtype), jnp.cumsum(trs, axis=0)], axis=0)

    # (B, n+1, ...) layout
    to_b = lambda x: jnp.moveaxis(x, 0, 1)
    n1 = n_steps + 1
    z = jnp.linspace(0.0, 1.0, n1, dtype=dtype)[None, :] * length[:, None]
    return PFRTrajectory(
        t=to_b(t_all),
        T=to_b(T_all),
        P=jnp.broadcast_to(P0[:, None], (B, n1)),
        Y=to_b(Y_all),
        rho=to_b(rho_all),
        u=to_b(u_all),
        z=z,
        converged=jnp.all(convs, axis=0),
        newton_iters=iters,
    )

"""Composed surrogate deployment: time-MLP + temp-MLP + CRNN.

Reference flows reproduced:
  * Eoff (SURROGATE_MODEL/surrogate_model_Eoff_single_model.py): analytic
    initial hexane concentration placed at slot ns-3 (:45-55), time-MLP grid
    with strict-monotonicity repair (:210-217,295-318), CRNN dopri5 at
    atol=rtol=1e-6 (:185), first-row zeroing of non-feed species (:346);
  * Eon (surrogate_model_Eon_single_model.py): per unique (T0,P0) the FULL
    trajectory is computed at reference geometry (L=1.0, u0=2.5) with the
    temp-MLP profile (:293-325), then each case is trimmed at
    argmin|t_full - t_end| where t_end comes from the time-MLP at the actual
    (L,u0) (:338-368). Metrics resample the truth at nearest times (:406-417).

`enforce_strict` is vectorized exactly: the reference's sequential
t[i] = max(t[i], t[i-1]+eps) recurrence equals i*eps + cummax(t - i*eps).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import ATOMIC_WEIGHTS, R_J_MOL
from ..solvers.dopri5 import odeint_dopri5
from . import mlp as mlp_mod
from .crnn import NS, CRNNConfig, crnn_rhs

MW_NC6H14 = 6 * ATOMIC_WEIGHTS["C"] + 14 * ATOMIC_WEIGHTS["H"]  # g/mol
MW_H2O = 2 * ATOMIC_WEIGHTS["H"] + ATOMIC_WEIGHTS["O"]
STEAM_DILUTION_RATIO = 0.7  # kg H2O per kg NC6H14 (:39)
HEXANE_SLOT = NS - 3  # reference writes the feed at index ns-3 (:54)


def initial_concentrations(T0, P0, ns: int = NS):
    """Feed concentration vector [mol/m^3]: ideal gas, hexane at slot ns-3.

    C_hex = P/(R T) * 1/(0.7 * MW_hex/MW_H2O + 1)   (:47-48); P in Pa.
    """
    T0 = jnp.asarray(T0)
    P0 = jnp.asarray(P0)
    c_hex = (P0 / (R_J_MOL * T0)) / (STEAM_DILUTION_RATIO * (MW_NC6H14 / MW_H2O) + 1.0)
    out = jnp.zeros(T0.shape + (ns,), T0.dtype)
    return out.at[..., HEXANE_SLOT].set(c_hex)


def enforce_strict(t, eps: float = 1e-5):
    """Strictly-increasing repair of a time grid, vectorized over leading dims.

    Equivalent to the reference's loop (surrogate_model_Eoff_single_model.py:
    210-217): t[i] = max(t[i], t[i-1] + eps).
    """
    t = jnp.asarray(t)
    idx = jnp.arange(t.shape[-1], dtype=t.dtype) * eps
    return jax.lax.cummax(t - idx, axis=t.ndim - 1) + idx


@dataclasses.dataclass
class ProfileModel:
    """One MLP + its scalers; predicts the 800 post-inlet grid values."""

    params: dict
    out_min: float
    out_max: float
    input_scale: np.ndarray  # (2, d)

    def predict(self, x_raw):
        """x_raw (B, d) -> denormalized (B, n_out); n_out inferred from params."""
        n_out = np.asarray(self.params["fc4"]["bias"]).shape[0]
        model = mlp_mod.ProfileMLP(output_node=n_out)
        xn = mlp_mod.normalize_inputs(jnp.asarray(x_raw, jnp.float32), self.input_scale)
        out = model.apply({"params": self.params}, xn)
        return out * (self.out_max - self.out_min) + self.out_min


def predict_time_grid(time_model: ProfileModel, T0, P0, L, u0, t_initial=None):
    """(B,) condition vectors -> strictly increasing (B, 801) time grids."""
    x = jnp.stack([jnp.asarray(T0), jnp.asarray(P0), jnp.asarray(L), jnp.asarray(u0)], 1)
    pred = time_model.predict(x)
    if t_initial is None:
        t_initial = jnp.zeros((pred.shape[0],), pred.dtype)
    grid = jnp.concatenate([jnp.asarray(t_initial)[:, None], pred], axis=1)
    return enforce_strict(grid.astype(jnp.float64))


def predict_temp_profile(temp_model: ProfileModel, T0, P0):
    """(B,) -> (B, 801) temperature profiles with T0 prepended (:257-263)."""
    x = jnp.stack([jnp.asarray(T0), jnp.asarray(P0)], 1)
    pred = temp_model.predict(x)
    return jnp.concatenate(
        [jnp.asarray(T0, pred.dtype)[:, None], pred], axis=1
    ).astype(jnp.float64)


def crnn_predict_batch(w_in, w_b, w_out, cfg: CRNNConfig, tgrid, Tprof, u0,
                       rtol=1e-6, atol=1e-6, max_spi=16):
    """Batched CRNN solve on given grids. Returns (B, 801, ns), clamped."""
    w_in = jnp.asarray(w_in)
    w_b = jnp.asarray(w_b)
    w_out = jnp.asarray(w_out)

    def one(ts_row, T_row, u0_row):
        rhs = lambda t, u: crnn_rhs(
            u, jnp.interp(t, ts_row, T_row), w_in, w_b, w_out, cfg
        )
        return odeint_dopri5(
            rhs, u0_row, ts_row, rtol=rtol, atol=atol, max_steps_per_interval=max_spi
        )

    sol = jax.vmap(one)(jnp.asarray(tgrid), jnp.asarray(Tprof), jnp.asarray(u0))
    return jnp.clip(sol, cfg.lb, cfg.ub)


def zero_initial_rows(species, n_obs: int = NS - 2):
    """Zero the t=0 value of all observed species except the feed (:346,398).

    species: (B, n_obs, T) -- the last observed row (NC6H14) keeps its value.
    """
    return species.at[:, : n_obs - 1, 0].set(0.0)


@dataclasses.dataclass
class SurrogateModel:
    """Full composed surrogate for one mechanism + energy mode."""

    w_in: np.ndarray
    w_b: np.ndarray
    w_out: np.ndarray
    cfg: CRNNConfig
    time_model: ProfileModel
    temp_model: ProfileModel | None = None  # Eon only
    n_obs: int = NS - 2

    def predict_eoff(self, T0, P0, L, u0, t_initial=None):
        """Isothermal deployment: (B,) conditions -> (tgrid, species).

        Returns tgrid (B, 801) and species (B, n_obs, 801) [mol/m^3].
        """
        tgrid = predict_time_grid(self.time_model, T0, P0, L, u0, t_initial)
        Tprof = jnp.broadcast_to(jnp.asarray(T0)[:, None], tgrid.shape)
        u0c = initial_concentrations(T0, P0)
        sol = crnn_predict_batch(
            self.w_in, self.w_b, self.w_out, self.cfg, tgrid, Tprof, u0c
        )
        species = jnp.swapaxes(sol, 1, 2)[:, : self.n_obs, :]
        return tgrid, zero_initial_rows(species, self.n_obs)

    def predict_eon_full(self, T0, P0):
        """Full-geometry Eon trajectories at (L=1.0, u0=2.5) per (T0, P0).

        Returns (tgrid (B, 801), Tprof (B, 801), species (B, ns, 801)).
        """
        B = jnp.asarray(T0).shape[0]
        tgrid = predict_time_grid(
            self.time_model, T0, P0, jnp.full((B,), 1.0), jnp.full((B,), 2.5)
        )
        Tprof = predict_temp_profile(self.temp_model, T0, P0)
        u0c = initial_concentrations(T0, P0)
        sol = crnn_predict_batch(
            self.w_in, self.w_b, self.w_out, self.cfg, tgrid, Tprof, u0c
        )
        return tgrid, Tprof, jnp.swapaxes(sol, 1, 2)

    def trim_eon_case(self, tgrid_full, species_full, Tprof_full, T0, P0, L, u0):
        """Trim one full trajectory at the time-MLP end time for (L, u0) (:338-357).

        Returns numpy (t_trim, T_trim, species_trim (n_obs, cut+1)) with the
        initial row zeroed. Single-case convenience over `trim_eon_batch`.
        """
        return self.trim_eon_batch(
            jnp.asarray(tgrid_full)[None], jnp.asarray(species_full)[None],
            jnp.asarray(Tprof_full)[None], np.zeros(1, int),
            [T0], [P0], [L], [u0],
        )[0]

    def trim_eon_batch(self, tgrid_full, species_full, Tprof_full, case_to_full,
                       T0, P0, L, u0):
        """Trim every case in ONE batched time-MLP call (:338-357, vectorized).

        tgrid_full (U, 801), species_full (U, ns, 801), Tprof_full (U, 801) are
        the deduped full trajectories; case_to_full (B,) maps each case to its
        unique (T0, P0) row. Returns a list of B numpy tuples
        (t_trim, T_trim, species_trim (n_obs, cut+1)) with initial rows zeroed.
        The cuts are ragged, so only the final slicing loops on the host; the
        MLP forward and the argmin run as one device computation (the reference
        re-predicts the grid per case in a Python loop, :338-345).
        """
        t_short = predict_time_grid(
            self.time_model,
            jnp.asarray(T0), jnp.asarray(P0), jnp.asarray(L), jnp.asarray(u0),
        )
        tg = np.asarray(tgrid_full)
        case_to_full = np.asarray(case_to_full)
        end_times = np.asarray(t_short[:, -1])
        cuts = np.abs(tg[case_to_full] - end_times[:, None]).argmin(axis=1)
        sp = np.asarray(species_full)
        Tp = np.asarray(Tprof_full)
        out = []
        for u, cut in zip(case_to_full, cuts):
            s = sp[u][: self.n_obs, : cut + 1].copy()
            s[:-1, 0] = 0.0
            out.append((tg[u][: cut + 1], Tp[u][: cut + 1], s))
        return out


def unique_conditions(T0, P0):
    """Dedupe (T0, P0) rows like the reference's dict keyed (T0, P0) (:293-325).

    Returns (uniq (U, 2), inverse (B,)) with uniq[inverse] == stacked input.
    """
    pairs = np.stack([np.asarray(T0), np.asarray(P0)], axis=1)
    uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
    return uniq, inv.reshape(-1)


def resample_nearest(t_ref, y_ref, t_query):
    """Nearest-time resampling of the truth (reference :406-417).

    t_ref (T,), y_ref (..., T), t_query (Q,) -> (..., Q).
    """
    t_ref = np.asarray(t_ref)
    idx = np.abs(t_ref[None, :] - np.asarray(t_query)[:, None]).argmin(axis=1)
    return np.asarray(y_ref)[..., idx]

"""CRNN (Chemical Reaction Neural Network): the 9-species / 9-reaction neural-ODE
surrogate whose weights are interpretable Arrhenius parameters.

Math (reference: SURROGATE_MODEL_TRAINING/Eoff_surrogate_model_training.py:276-316):
  state u in R^9 = concentrations [mol/m^3];
  feature v = [ln clamp(u, lb, ub), -1/(R_kcal T(t)), ln T(t)] in R^11;
  du/dt = w_out @ exp(clamp(w_in^T v + w_b, +-i_max))  clamped to +-du_max.

Parameter transform `parameter_converter` (reference :204-244):
  raw vector p (nr*(3+2*ns) = 189 entries) -> (w_in (11,9), w_b (9,), w_out (9,9))
  with box constraints, the element-conservation nullspace projection of w_out
  columns (H/C atom counts), and reactant orders tied to negative stoichiometry
  (w_in = clamp(-w_out, 0, ul)).

Two presets mirror the reference's training scripts: "default"
(Eoff/Eon_surrogate_model_training.py) and "wide"
(WIDE_Eoff_surrogate_model_training.py:16-52,165-188 -- slope_reg=0.5, looser
w_out bounds, tighter intermediate clamp).

Everything is pure jnp: the transform stays inside jit/grad, and the projection
is a PRECOMPUTED fixed 9x9 matrix (X (X^T X + eps I)^-1 X^T), not a per-call
linear solve.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..constants import R_KCAL_MOL

NS = 9
NR = 9
SIZE_P = NR * (3 + 2 * NS)  # 189

# H and C atom counts of the 9 lumped species
# (Eoff_surrogate_model_training.py:144-147)
SPECIES_9 = ["H2", "CH4", "C2H4", "C2H6", "C3H6", "C4H8-1", "NC6H14", "C4H10", "C5H10-1"]
E_H = np.array([2.0, 4.0, 4.0, 6.0, 6.0, 8.0, 14.0, 10.0, 10.0])
E_C = np.array([0.0, 1.0, 2.0, 2.0, 3.0, 4.0, 6.0, 4.0, 5.0])
E_MATRIX = np.stack([E_H, E_C], axis=1)  # (ns, 2)

# Seed Arrhenius fits hand-copied from stage 1
# (Eoff_surrogate_model_training.py:26-38; WIDE_...py:21-37)
A_FIT = 18.42068
SEED_FITS = {
    "LLNL": (2.3263, 67.933),
    "NUIG": (1.858, 58.397),
    "NUIGMech1.1": (1.858, 58.397),
    "JetSurf": (2.1133, 61.713),
}
SEED_FITS_WIDE = {
    "LLNL": (2.112, 63.304),
    "NUIG": (1.796, 56.955),
    "NUIGMech1.1": (1.796, 56.955),
    "JetSurf": (1.826, 55.792),
}


@dataclasses.dataclass(frozen=True)
class CRNNConfig:
    """Preset-dependent constants of the CRNN transform and RHS."""

    b_fit: float
    ea_fit: float
    a_fit: float = A_FIT
    variant: str = "default"  # "default" | "wide"
    energy_on: bool = False  # Eon scripts drop b_fit from the Ea slope
    lb: float = 1.0e-5  # state clamp floor (1e-6 in wide + deployment)
    ub: float = 60.0
    intermediate_clip: float = 30.0  # 10.0 in wide
    du_clip: float = 1.0e5
    wout_bound: float = 2.0  # 5.0 in wide
    ea_low: float = 10.0  # 5.0 in wide
    a_low: float = 3.0  # 1.0 in wide
    proj_eps: float = 1e-4

    @property
    def slopes(self):
        """(slope_A, slope_b, slope_Ea) of the raw->physical parameter map.

        default: Eoff_surrogate_model_training.py:208-210
        eon:     Eon_surrogate_model_training.py:292-294 (Ea slope without b_fit)
        wide:    WIDE_Eoff_surrogate_model_training.py:183-188 (slope_reg=0.5,
                 different Ea/A denominators)
        """
        A, b, Ea = self.a_fit, self.b_fit, self.ea_fit
        if self.variant == "wide":
            reg = 0.5
            return (
                A * (A / (A + NR)) * reg,
                b * ((A + b + NR) / (A + b + NR + NS)) * reg,
                Ea * ((Ea + A + NR) / (Ea - NR)) * reg,
            )
        slope_ea = (
            Ea * ((Ea + A + NS + NR) / (Ea - NS - NR))
            if self.energy_on
            else Ea * ((Ea + A + b + NS + NR) / (Ea - b - NS - NR))
        )
        return (
            A * (A / (A + NS + NR)),
            b * ((A + b + NR) / (A + b + NR + NS)),
            slope_ea,
        )


def config_for(mech_name: str, variant: str = "default", energy_on: bool = False) -> CRNNConfig:
    fits = SEED_FITS_WIDE if variant == "wide" else SEED_FITS
    b_fit, ea_fit = fits[mech_name]
    if variant == "wide":
        return CRNNConfig(
            b_fit=b_fit, ea_fit=ea_fit, variant="wide", lb=1e-6,
            intermediate_clip=10.0, wout_bound=5.0, ea_low=5.0, a_low=1.0,
        )
    return CRNNConfig(b_fit=b_fit, ea_fit=ea_fit, energy_on=energy_on)


def _nullspace_projector(eps: float) -> np.ndarray:
    """Fixed projector onto the nullspace of E^T (regularized least squares).

    Reference builds E_null from SVD (:148-149) and solves
    (X^T X + eps I)^-1 X^T w per column (:223-229); since X is constant this
    collapses to one precomputable 9x9 matrix.
    """
    _, _, vh = np.linalg.svd(E_MATRIX.T, full_matrices=True)
    x = vh[E_MATRIX.shape[1] :].T  # (ns, ns-2)
    return x @ np.linalg.solve(x.T @ x + eps * np.eye(x.shape[1]), x.T)


def anchor_column() -> np.ndarray:
    """w_out column-1 init: solve E^T w = 0 with w[NC6H14] = -1 (:153-176)."""
    b = np.zeros((2, 1))
    w = np.zeros((NS, 1))
    w[6, 0] = -1.0
    b_adj = b - E_MATRIX.T[:, 6:7] @ w[6:7, :]
    a_red = np.concatenate([E_MATRIX.T[:, :6], E_MATRIX.T[:, 7:]], axis=1)
    x_red, *_ = np.linalg.lstsq(a_red, b_adj, rcond=None)
    w[:6, :] = x_red[:6, :]
    w[7:, :] = x_red[6:, :]
    return w[:, 0]


def parameter_converter(p, cfg: CRNNConfig):
    """Raw parameter vector -> (w_in (ns+2, nr), w_b (nr,), w_out (ns, nr)).

    Differentiable and jit-safe; mirrors ParameterConverter (:204-244).
    """
    slope_A, slope_b, slope_Ea = cfg.slopes
    proj = jnp.asarray(_nullspace_projector(cfg.proj_eps), p.dtype)

    w_b = jnp.clip(jnp.abs(p[:NR]) * slope_A, cfg.a_low, 21.0)
    w_in_b = jnp.clip(p[NR : 2 * NR] * slope_b, -3.0, 3.0)
    w_in_Ea = jnp.clip(jnp.abs(p[2 * NR : 3 * NR] * slope_Ea), cfg.ea_low, 200.0)
    w_out = p[3 * NR : NR * (NS + 3)].reshape(NS, NR)
    w_out = jnp.clip(proj @ w_out, -cfg.wout_bound, cfg.wout_bound)
    w_in_only = jnp.clip(-w_out, 0.0, cfg.wout_bound)
    w_in = jnp.concatenate([w_in_only, w_in_Ea[None, :], w_in_b[None, :]], axis=0)
    return w_in, w_b, w_out


def init_parameters(seed: int, cfg: CRNNConfig) -> np.ndarray:
    """Random init of p replicating the reference's scheme (:117-198).

    abs values ~ U(0.1, 1) with random signs; indices 0, nr, 2nr forced so the
    first neuron's (A, b, Ea) equal the stage-1 seed fit after the transform;
    w_out block shifted/scaled and its first column set to the element-balance
    anchor; Ea block copied from |A block| (reference quirk :195, kept).
    """
    rng = np.random.default_rng(seed)
    p = (rng.random(SIZE_P) * 0.9 + 0.1) * rng.choice([-1.0, 1.0], SIZE_P)
    p[0] = 1.0
    p[NR] = 1.0
    p[2 * NR] = 1.0
    if cfg.variant != "wide":  # wide keeps the raw draw (WIDE_...py:168-169)
        p[3 * NR : NR * (NS + 3)] += 0.4
        p[3 * NR : NR * (NS + 3)] *= 0.5
    w1 = anchor_column()
    for i in range(NS):
        p[NR * 3 + i * NR] = w1[i]
    p[:NR] = np.abs(p[:NR])
    p[2 * NR : 3 * NR] = np.abs(p[:NR])  # reference quirk: copies the A block
    slope_A, slope_b, slope_Ea = cfg.slopes
    p[0] *= cfg.a_fit / slope_A
    p[NR] *= cfg.b_fit / slope_b
    p[2 * NR] *= cfg.ea_fit / slope_Ea
    return p


def crnn_rhs(u, T, w_in, w_b, w_out, cfg: CRNNConfig):
    """du/dt of the CRNN at state u (..., ns) and temperature T (...)."""
    Y = jnp.clip(u, cfg.lb, cfg.ub)
    logX = jnp.log(Y)
    Tb = jnp.asarray(T)[..., None]
    v = jnp.concatenate(
        [logX, -1.0 / (R_KCAL_MOL * Tb), jnp.log(Tb)], axis=-1
    )  # (..., ns+2)
    inter = v @ w_in + w_b  # (..., nr)
    inter = jnp.clip(inter, -cfg.intermediate_clip, cfg.intermediate_clip)
    du = jnp.exp(inter) @ w_out.T
    return jnp.clip(du, -cfg.du_clip, cfg.du_clip)


def element_balance_residual(w_out) -> jnp.ndarray:
    """E^T w_out -- the conservation invariant the projection enforces. (2, nr)."""
    return jnp.asarray(E_MATRIX.T) @ w_out

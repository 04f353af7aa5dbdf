"""NASA7 polynomial thermodynamics + ideal-gas mixture properties (pure jnp).

Replaces Cantera's thermo layer (reference scripts rely on `gas.TPY`,
`thermo.density_mass`, `states.concentrations`; e.g.
CRNN_TEMP_PRED_MODEL_TRAINING_DATASET_GENERATION/simul_data_gene_fix_chain_2D.py:58-67,
146-171). All functions are shape-polymorphic over a leading batch axis and are
written to be vmapped / jitted; temperature selects the low/high polynomial branch
with `jnp.where` so everything stays branch-free for XLA.

Molar quantities are per kmol (Cantera convention); R = 8314.462618 J/(kmol K).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import GAS_CONSTANT


def _select_coeffs(T, tmid, coeffs):
    """Pick low/high NASA7 coefficient rows per species for temperatures T.

    T: (...,) broadcastable against species axis; tmid: (ns,); coeffs: (ns, 2, 7).
    Returns (..., ns, 7).
    """
    T = jnp.asarray(T)[..., None]  # (..., 1)
    use_high = (T >= tmid)[..., None]  # (..., ns, 1)
    return jnp.where(use_high, coeffs[:, 1, :], coeffs[:, 0, :])


def cp_R(T, tmid, coeffs):
    """Dimensionless species heat capacities cp_k/R.  Returns (..., ns)."""
    a = _select_coeffs(T, tmid, coeffs)
    T = jnp.asarray(T)[..., None]
    return a[..., 0] + T * (a[..., 1] + T * (a[..., 2] + T * (a[..., 3] + T * a[..., 4])))


def h_RT(T, tmid, coeffs):
    """Dimensionless species enthalpies h_k/(R T).  Returns (..., ns)."""
    a = _select_coeffs(T, tmid, coeffs)
    T = jnp.asarray(T)[..., None]
    return (
        a[..., 0]
        + T * (a[..., 1] / 2 + T * (a[..., 2] / 3 + T * (a[..., 3] / 4 + T * a[..., 4] / 5)))
        + a[..., 5] / T
    )


def s_R(T, tmid, coeffs):
    """Dimensionless species entropies s_k/R at standard pressure.  (..., ns)."""
    a = _select_coeffs(T, tmid, coeffs)
    T = jnp.asarray(T)[..., None]
    return (
        a[..., 0] * jnp.log(T)
        + T * (a[..., 1] + T * (a[..., 2] / 2 + T * (a[..., 3] / 3 + T * a[..., 4] / 4)))
        + a[..., 6]
    )


def g_RT(T, tmid, coeffs):
    """Dimensionless standard-state Gibbs energies g_k/(R T).  (..., ns)."""
    return h_RT(T, tmid, coeffs) - s_R(T, tmid, coeffs)


# ---------------------------------------------------------------------------
# ideal-gas mixture helpers (mass-fraction based state)
# ---------------------------------------------------------------------------


def mean_molecular_weight(Y, mw):
    """Mixture mean molecular weight [kg/kmol] from mass fractions. (...,)."""
    return 1.0 / jnp.sum(Y / mw, axis=-1)


def density(T, P, Y, mw):
    """Ideal-gas mass density [kg/m^3]. (...,)."""
    return P * mean_molecular_weight(Y, mw) / (GAS_CONSTANT * T)


def concentrations(T, P, Y, mw):
    """Molar concentrations [kmol/m^3] per species. (..., ns)."""
    rho = density(T, P, Y, mw)
    return rho[..., None] * Y / mw


def mass_fractions_from_concentrations(C, mw):
    """Mass fractions from molar concentrations. (..., ns)."""
    massic = C * mw
    return massic / jnp.sum(massic, axis=-1, keepdims=True)


def enthalpy_mass(T, Y, mw, tmid, coeffs):
    """Specific mixture enthalpy [J/kg]. (...,)."""
    hk = h_RT(T, tmid, coeffs) * (GAS_CONSTANT * jnp.asarray(T)[..., None]) / mw
    return jnp.sum(Y * hk, axis=-1)


def cp_mass(T, Y, mw, tmid, coeffs):
    """Specific mixture heat capacity [J/(kg K)]. (...,)."""
    cpk = cp_R(T, tmid, coeffs) * GAS_CONSTANT / mw
    return jnp.sum(Y * cpk, axis=-1)


def mass_fractions_from_composition_string(comp: str, species_names, mw) -> "jnp.ndarray":
    """Parse a Cantera-style 'A:1.0, B:0.7' mass-composition string -> Y array.

    Mirrors `gas.TPY = T, P, composition_0` with composition by mass
    (reference: simul_data_gene_fix_chain_2D.py:38,58).
    """
    import numpy as np

    y = np.zeros(len(species_names))
    for part in comp.split(","):
        name, val = part.split(":")
        y[list(species_names).index(name.strip())] = float(val)
    return jnp.asarray(y / y.sum())

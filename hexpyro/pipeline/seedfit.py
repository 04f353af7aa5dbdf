"""Stage 1: feed-consumption-rate probe + global Arrhenius seed fit.

Reference:
  * INITIAL_ARRHENIUS_PARAMETER_OPTIMIZATION/reactant_consumption_rate.py --
    sweep T = 850..1150 K step 2 at P = 1 bar (:15-16), pure NC6H14 feed (:21),
    isothermal const-P batch reactor advanced over 10 coarse steps spanning
    t = L/u0 = 1.6/1600 = 1e-3 s, i.e. dt = 1e-4 s (:23-26,54-55); the
    FIRST-interval consumption rate |C1 - C0| / dt in mol/L/s (:83-84) goes to a CSV
    (temperature, ini_feed_concentration, feed_cons_rate) (:36);
  * rate_coefficients_fitting.py -- sort by T (:11-14), k = rate / C0 (:26-27),
    fit k(T) = 1e8 T^b exp(-Ea/(R_kcal T)) with A frozen (=> ln A = 18.42068),
    bounds b in [-5, 5], Ea in [0, 100] kcal/mol (:16-17,30-34).

The CSV schema quirk (stage 1 writes 'ini_feed_concentration', stage 2 reads
'initial_feed_concentration', most checked-in files have a corrupted header)
is resolved to ONE canonical header; the reader also accepts the corrupt ones.

The T sweep is a single batched TPU solve instead of a Python loop of Cantera
networks: all 151 temperatures advance together in one while_loop.
"""

from __future__ import annotations

import io

import numpy as np
from scipy.optimize import curve_fit

from ..constants import R_KCAL_MOL
from ..reactors.batch import BatchOptions, advance_batch

CSV_HEADER = "temperature,ini_feed_concentration,feed_cons_rate"
A_FROZEN = 1.0e8  # :16; ln(1e8) = 18.42068 is the A_fit used by CRNN training


def consumption_rate_sweep(
    arr,
    species_names,
    T_start: float = 850.0,
    T_end: float = 1150.0,
    T_step: float = 2.0,
    P: float = 1.0e5,
    length: float = 1.6,
    u0: float = 1600.0,
    n_steps: int = 10,
    dtype=None,
):
    """Batched probe -> (T (n,), C0 [mol/L] (n,), rate [mol/L/s] (n,))."""
    import jax.numpy as jnp

    T = np.arange(T_start, T_end + 0.5 * T_step, T_step)
    n = len(T)
    ns = arr.n_species
    i_hex = list(species_names).index("NC6H14")
    Y0 = np.zeros((n, ns))
    Y0[:, i_hex] = 1.0  # pure NC6H14 (:21)
    Tj = jnp.asarray(T, arr.dtype)
    Pj = jnp.full((n,), P, arr.dtype)
    Y0j = jnp.asarray(Y0, arr.dtype)

    from ..thermo import nasa7

    dt = (length / u0) / n_steps  # first coarse interval (:23-26)
    rho0 = nasa7.density(Tj, Pj, Y0j, arr.mw)
    C0 = rho0 * Y0j[:, i_hex] / arr.mw[i_hex]  # kmol/m^3 == mol/L

    Y1, done = advance_batch(arr, Y0j, Tj, Pj, dt, BatchOptions())
    rho1 = nasa7.density(Tj, Pj, Y1, arr.mw)
    C1 = rho1 * Y1[:, i_hex] / arr.mw[i_hex]
    rate = jnp.abs(C1 - C0) / dt  # mol/L/s (:83-84)
    return np.asarray(Tj), np.asarray(C0), np.asarray(rate), np.asarray(done)


def write_consumption_csv(path: str, T, C0, rate) -> None:
    data = np.stack([T, C0, rate], axis=1)
    np.savetxt(path, data, delimiter=",", header=CSV_HEADER, comments="")


def read_consumption_csv(path: str):
    """Accepts our canonical header, the reference's two variants, and the
    corrupted 'tem,inion,fate' header present in most checked-in CSVs."""
    with open(path) as f:
        first = f.readline()
        rest = f.read()
    has_header = not first.strip()[:1].isdigit()
    text = rest if has_header else first + rest
    data = np.loadtxt(io.StringIO(text), delimiter=",")
    return data[:, 0], data[:, 1], data[:, 2]


def fit_seed_arrhenius(T, C0, rate, a_frozen: float = A_FROZEN):
    """Fit k = rate/C0 to a_frozen * T^b * exp(-Ea/(R_kcal T)).

    Returns (b, Ea [kcal/mol]); reproduces rate_coefficients_fitting.py:16-34.
    """
    order = np.argsort(T)
    T = np.asarray(T)[order]
    k = (np.asarray(rate) / np.asarray(C0))[order]

    def model_k(t, b, ea):
        return a_frozen * t**b * np.exp(-ea / (R_KCAL_MOL * t))

    popt, _ = curve_fit(
        model_k, T, k, p0=[0.0, 50.0], bounds=([-5.0, 0.0], [5.0, 100.0]), maxfev=20000
    )
    return float(popt[0]), float(popt[1])

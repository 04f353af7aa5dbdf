#!/usr/bin/env python
"""Root-cause analysis of the stage-1 probe rate gap (VERDICT round-1 weak #5).

Our first-interval consumption rates run above the reference's checked-in
INITIAL_FEED_CONSUMPTION_RATE CSVs. This script integrates the SAME isothermal
const-pressure reactor with an independent f64 scipy BDF (analytic Jacobian,
rtol 1e-10) and:

  1. checks our advance_batch against scipy at dt = 1e-4 s (integrator check);
  2. scans candidate first-interval lengths dt' to see whether some other dt
     reproduces the CSV rates (script-parameter-drift hypothesis: the checked-in
     CSVs have 151 rows where the checked-in script's T grid has 150, so the
     CSVs demonstrably predate the script);
  3. reports the rate ratio ours/CSV across T for each hypothesis.

Run: python scripts/probe_gap_analysis.py [JetSurf|NUIGMech1.1|LLNL]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from scipy.integrate import solve_ivp

from hexpyro.mechanism import load_mechanism, to_device_arrays
from hexpyro.pipeline.seedfit import read_consumption_csv
from hexpyro.reactors.batch import BatchOptions, advance_batch
from hexpyro.reactors.cstr import _jac_YY
from hexpyro.thermo import nasa7

MECH = sys.argv[1] if len(sys.argv) > 1 else "JetSurf"
TAG = "NUIG" if MECH.startswith("NUIG") else MECH
CSV = (
    "/root/reference/INITIAL_ARRHENIUS_PARAMETER_OPTIMIZATION/"
    f"INITIAL_FEED_CONSUMPTION_RATE/{TAG}_cons_rate_1b_v2.csv"
)

mech = load_mechanism(f"/root/reference/DETAILED_KINETIC_MODEL/{MECH}.yaml")
arr = to_device_arrays(mech, dtype=jnp.float64)
i_hex = list(mech.species_names).index("NC6H14")
ns = arr.n_species

T_csv, C0_csv, rate_csv = read_consumption_csv(CSV)

P = 1.0e5
DT = 1e-4  # length/u0/n_steps = 1.6/1600/10 (reference :23-26)


def c_hex(T, Y):
    rho = float(nasa7.density(jnp.asarray([T]), jnp.asarray([P]), jnp.asarray(Y)[None], arr.mw)[0])
    return rho * Y[i_hex] / float(arr.mw[i_hex])


def scipy_solve(T, t_end, rtol=1e-8, atol=1e-14):
    """Isothermal const-P batch reactor: dY/dt = wdot*W/rho, f64 BDF."""
    from hexpyro.reactors.cstr import _rhs_eoff

    Tj = jnp.asarray([T])
    Pj = jnp.asarray([P])
    Y0 = np.zeros(ns)
    Y0[i_hex] = 1.0
    zero = jnp.zeros_like(Tj)
    rhs_j = jax.jit(lambda Y: _rhs_eoff(Y, Tj, Pj, jnp.asarray(Y0)[None], zero, arr))
    jac_j = jax.jit(lambda Y: _jac_YY(Tj, Pj, Y, zero, arr)[0])
    f = lambda t, y: np.asarray(rhs_j(jnp.asarray(y)[None]))[0]
    jac = lambda t, y: np.asarray(jac_j(jnp.asarray(y)[None]))[0]
    sol = solve_ivp(f, (0.0, t_end), Y0, method="BDF", jac=jac, rtol=rtol, atol=atol)
    assert sol.success
    return sol.y[:, -1]


SECTIONS = sys.argv[2].split(",") if len(sys.argv) > 2 else ["csv", "ours", "dtscan"]
sel = np.linspace(0, len(T_csv) - 1, 4).astype(int)

if "csv" in SECTIONS:
    print(f"== {MECH}: scipy-BDF first-interval rate vs checked-in CSV (dt={DT:g}) ==")
    ratios = []
    for i in sel:
        T = float(T_csv[i])
        Y1 = scipy_solve(T, DT)
        C0 = c_hex(T, np.eye(ns)[i_hex])
        C1 = c_hex(T, Y1)
        r = abs(C1 - C0) / DT
        ratios.append(r / rate_csv[i])
        print(f"T={T:7.1f}  scipy={r:.6e}  csv={rate_csv[i]:.6e}  "
              f"ratio={r / rate_csv[i]:.4f}", flush=True)
    print(f"ratio scipy/csv: min {min(ratios):.3f} max {max(ratios):.3f}")

if "ours" in SECTIONS:
    # our integrator vs scipy at the same dt (integrator check)
    print("\n== advance_batch vs scipy at dt=1e-4 (rate ratio ours/scipy) ==", flush=True)
    Tsel = np.array([float(T_csv[i]) for i in sel])
    Y0b = np.zeros((len(sel), ns))
    Y0b[:, i_hex] = 1.0
    Yb, done = advance_batch(
        arr, jnp.asarray(Y0b), jnp.asarray(Tsel), jnp.full(len(sel), P), DT,
        BatchOptions(rtol=1e-6, atol=1e-12),
    )
    for j, i in enumerate(sel):
        T = float(T_csv[i])
        C0 = c_hex(T, np.eye(ns)[i_hex])
        C1o = c_hex(T, np.asarray(Yb[j]))
        Y1 = scipy_solve(T, DT)
        C1s = c_hex(T, Y1)
        ro, rs = abs(C1o - C0) / DT, abs(C1s - C0) / DT
        print(f"T={T:7.1f}  ours={ro:.6e}  scipy={rs:.6e}  ratio={ro / rs:.5f}", flush=True)

if "dtscan" in SECTIONS:
    # dt-scan hypothesis: does some other first-interval length reproduce the
    # CSV? dt=1e-3 doubles as the "mean rate over the whole 10-interval probe"
    # hypothesis |C(t_total) - C0| / t_total.
    print("\n== dt scan (scipy rate / csv rate), per dt candidate ==", flush=True)
    for dt in (2e-5, 5e-5, 2e-4, 1e-3):
        rr = []
        for i in sel[1:3]:
            T = float(T_csv[i])
            Y1 = scipy_solve(T, dt)
            C0 = c_hex(T, np.eye(ns)[i_hex])
            r = abs(c_hex(T, Y1) - C0) / dt
            rr.append(r / rate_csv[i])
        print(f"dt={dt:8.2e}  ratio min {min(rr):.3f} max {max(rr):.3f} "
              f"mean {np.mean(rr):.3f}", flush=True)

#!/usr/bin/env python
"""A/B SteadyOptions variants on the adiabatic (Eon) LLNL chain, real TPU.

The Eon segment solve carries an extra unknown (T) and a finite-difference
dwdot/dT Jacobian column, and runs ~3x slower per case than the Eoff chain
(LLNL Eon sweep: ~0.16 cases/s vs ~0.44 for NUIG Eoff with carry_jacobian).
This harness times candidate option overrides on 16 flagship cases spread
across the LHS temperature range at production segment sizing, and prints
wall clock, convergence, Newton-iteration stats, and the physics guardrails
(adiabatic enthalpy drift in K-equivalents, outlet-T range) per variant.

Usage:
  PYTHONPATH=/root/repo python scripts/eon_solver_ab.py <n_steps> [variant_json ...]
e.g.
  python scripts/eon_solver_ab.py 100 '{}' '{"jac_refresh_every": 4}' \
      '{"richardson_iters": 2}'

Run only when the TPU is otherwise idle (one chip; a concurrent sweep owns
the device).
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("HEXPYRO_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["HEXPYRO_PLATFORM"])
jax.config.update("jax_default_matmul_precision", "highest")
cache = "/root/.cache/jax_compile"
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np

from hexpyro.mechanism import load_mechanism, to_device_arrays
from hexpyro.reactors.cstr import default_steady_options
from hexpyro.reactors.pfr import simulate_pfr_windowed
from hexpyro.thermo import nasa7


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    variants = [json.loads(v) for v in sys.argv[2:]] or [{}]
    window = 25

    # HEXPYRO_AB_MECH selects the mechanism (default LLNL); the NUIG chain is
    # ~8x costlier per case (924 species, n^3 linear algebra), so its sweep
    # knobs deserve their own A/B before burning hours of TPU
    mech_name = os.environ.get("HEXPYRO_AB_MECH", "LLNL")
    tag = "nuig" if mech_name.startswith("NUIG") else mech_name.lower()
    cases = np.loadtxt(
        f"runs/flagship_{tag}_eon/sampling_case_2D.csv", delimiter=","
    )
    order = np.argsort(cases[:, 0])
    sel = cases[order[np.linspace(0, len(cases) - 1, 16).astype(int)]]

    yaml_name = "NUIGMech1.1" if mech_name.startswith("NUIG") else mech_name
    mech = load_mechanism(
        f"/root/reference/DETAILED_KINETIC_MODEL/{yaml_name}.yaml",
        name=mech_name,
    )
    arr = to_device_arrays(mech, dtype=jnp.float32)
    T0 = jnp.asarray(sel[:, 0], jnp.float32)
    P0 = jnp.asarray(sel[:, 1] * 1e5, jnp.float32)

    for var in variants:
        opts = dataclasses.replace(default_steady_options(jnp.float32), **var)
        t0 = time.time()
        traj = simulate_pfr_windowed(
            arr, T0, P0, window=window, n_steps=n_steps,
            length=n_steps / 800.0,  # production dz = L/800
            energy_on=True, species_names=mech.species_names, opts=opts,
        )
        wall = time.time() - t0
        T = np.asarray(traj.T)
        Y = np.asarray(traj.Y)
        conv = np.asarray(traj.converged)
        iters = np.asarray(traj.newton_iters, float)
        Tf = jnp.asarray(T.reshape(-1))
        Yf = jnp.asarray(Y.reshape(-1, Y.shape[-1]))
        h = np.asarray(
            nasa7.enthalpy_mass(Tf, Yf, arr.mw, arr.nasa_tmid, arr.nasa_coeffs)
        ).reshape(T.shape)
        cp = np.asarray(
            nasa7.cp_mass(Tf, Yf, arr.mw, arr.nasa_tmid, arr.nasa_coeffs)
        ).reshape(T.shape)
        drift = np.abs((h - h[:, :1]) / cp).max()
        print(
            f"opts={json.dumps(var)} wall={wall:.1f}s "
            f"conv={int(conv.sum())}/{len(conv)} "
            f"iters mean={iters.mean():.2f} max={iters.max():.0f} "
            f"h-drift={drift:.3f}K Tout=[{T[:, -1].min():.1f},{T[:, -1].max():.1f}]",
            flush=True,
        )


if __name__ == "__main__":
    main()

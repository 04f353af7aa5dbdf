"""Validate the Eon basin-hop fix on the 8 LLNL cases that collapsed.

Runs the previously-catastrophic flagship LLNL Eon cases (runs/flagship_llnl_eon
cases 102/128/135/262/311/527/538/678, which quenched 450-886 K in one segment)
through the fixed f32 production solver and checks the adiabatic invariant:
h(T_n, Y_n) == h(T0, Y_feed) along the whole chain (each segment enforces
h = h_in, so total enthalpy is conserved for the adiabatic PFR).

Usage: python scripts/eon_rescue_check.py [n_segments]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from hexpyro.mechanism import load_mechanism, to_device_arrays
from hexpyro.reactors.pfr import make_windowed_step, simulate_pfr_windowed
from hexpyro.thermo import nasa7

n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 800
WINDOW = 25

cases = np.loadtxt("runs/flagship_llnl_eon/sampling_case_2D.csv", delimiter=",")
bad = [102, 128, 135, 262, 311, 527, 538, 678]
sel = cases[[k - 1 for k in bad]]
sel = np.concatenate([sel, sel])  # pad to B=16 (production chunk size)

mech = load_mechanism("/root/reference/DETAILED_KINETIC_MODEL/LLNL.yaml", name="LLNL")
arr = to_device_arrays(mech, dtype=jnp.float32)

T0 = jnp.asarray(sel[:, 0], jnp.float32)
P0 = jnp.asarray(sel[:, 1] * 1e5, jnp.float32)

t0 = time.time()
traj = simulate_pfr_windowed(
    arr, T0, P0, window=WINDOW, n_steps=n_steps,
    # keep the production segment size dz = 1.0/800 m for partial runs: the
    # per-segment dT thresholds below are calibrated for that dz (a coarser
    # dz reacts more per segment and trips them spuriously)
    length=n_steps / 800.0,
    energy_on=True, species_names=mech.species_names,
)
print(f"simulated {n_steps} segments x 16 lanes in {time.time()-t0:.1f}s")

Y = np.asarray(traj.Y)  # (B, n+1, ns)
T = np.asarray(traj.T)
conv = np.asarray(traj.converged)
B = len(bad)
h = np.asarray(
    nasa7.enthalpy_mass(
        jnp.asarray(T.reshape(-1)), jnp.asarray(Y.reshape(-1, Y.shape[-1])),
        arr.mw, arr.nasa_tmid, arr.nasa_coeffs,
    )
).reshape(T.shape)
cp = np.asarray(
    nasa7.cp_mass(
        jnp.asarray(T.reshape(-1)), jnp.asarray(Y.reshape(-1, Y.shape[-1])),
        arr.mw, arr.nasa_tmid, arr.nasa_coeffs,
    )
).reshape(T.shape)
dT_equiv = (h - h[:, :1]) / cp  # enthalpy drift in temperature units [K]

ok = True
for i, k in enumerate(bad):
    dT_seg = np.diff(T[i])
    drift = np.abs(dT_equiv[i]).max()
    status = "OK" if (drift < 3.0 and dT_seg.min() > -30) else "BAD"
    if status == "BAD":
        ok = False
    print(
        f"case {k}: T0={T[i,0]:7.1f} Tout={T[i,-1]:7.1f} min_dT/seg={dT_seg.min():8.2f} "
        f"max|h-drift|={drift:6.3f} K conv={bool(conv[i])} {status}"
    )
print("ALL OK" if ok else "FAILURES PRESENT")

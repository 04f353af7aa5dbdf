#!/usr/bin/env python
"""Self-contained CPU-f64 spotcheck of the wide-range cold edge.

Round-3's 1.347e-6 cold-edge requalification number was measured in the TPU
lane, i.e. against TPU-EMULATED f64 (f32 exponent range — a weaker reference
in exactly the near-frozen trace-species regime the check targets; advisor
r3 finding #1). This script re-measures the bound against TRUE CPU f64,
without needing the sweep dataset on disk: it solves the rank-K coldest wide
case (the coldest case NOT force-f64'd by `wide_requalify fix`, rank 32 by
default) at the production f32 configuration AND at f64, both on CPU, and
reports max rel-to-peak disagreement over the 9 tracked species.

The committed wide dataset's 32 coldest entries are f64-rescue solves, so
this rank-K bound covers every f32 entry that remains.

Usage (CPU lane, ~10-30 min on one core):
  HEXPYRO_SPOT_RANK=32 python scripts/wide_cpu_spotcheck.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # JAX_PLATFORMS env is ignored here
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from hexpyro.mechanism import load_mechanism, to_device_arrays
from hexpyro.pipeline.config import PipelineConfig
from hexpyro.reactors.cstr import default_steady_options
from hexpyro.reactors.pfr import simulate_pfr, tracked_indices
from hexpyro.sampling import lhs


def main():
    cfg = PipelineConfig(mechanism="LLNL", wide=True, n_cases=800,
                         out_root="runs/wide_cpu_spotcheck", dtype="f32")
    os.makedirs(cfg.out_root, exist_ok=True)
    if not os.path.exists(cfg.cases_csv):
        from hexpyro.pipeline import stages

        stages.stage_sample(cfg)  # deterministic seed-2024 wide draw
    cases = lhs.read_cases_csv(cfg.cases_csv)[: cfg.n_cases]
    rank = int(os.environ.get("HEXPYRO_SPOT_RANK", "32"))
    worst = int(np.argsort(cases[:, 0])[rank])
    T0, P0 = float(cases[worst, 0]), float(cases[worst, 1] * 1e5)
    print(f"[cpu-spotcheck] rank-{rank} coldest case {worst + 1}: "
          f"T0={T0:.1f} K, P0={P0/1e5:.3f} bar", flush=True)

    mech = load_mechanism(cfg.mech_path, name="LLNL")
    tracked = tracked_indices(mech.species_names)
    out = {}
    for dt in (jnp.float32, jnp.float64):
        arr = to_device_arrays(mech, dtype=dt)
        fn = jax.jit(
            lambda t, p, arr=arr, dt=dt: simulate_pfr(
                arr, t, p, species_names=mech.species_names,
                n_steps=cfg.n_steps, opts=default_steady_options(dt),
            )
        )
        traj = fn(jnp.asarray([T0], dt), jnp.asarray([P0], dt))
        conv = bool(np.asarray(traj.converged).all())
        out[dt] = np.asarray(traj.concentrations(arr))[0][:, tracked]
        print(f"[cpu-spotcheck] {np.dtype(dt).name} solve done, "
              f"converged={conv}", flush=True)

    C32, C64 = out[jnp.float32], out[jnp.float64]
    rel = np.abs(C32 - C64) / np.maximum(np.abs(C64).max(0), 1e-30)
    print(f"[cpu-spotcheck] max rel-to-peak f32 vs TRUE CPU f64 = "
          f"{rel.max():.3e} (target <= 1e-2)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Headline benchmark: stiff PFR trajectories/sec/chip (NUIGMech1.1, 2D LHS).

Runs the batched Eoff PFR chain (the reference pipeline's dominant cost:
CRNN_TEMP_PRED_MODEL_TRAINING_DATASET_GENERATION/simul_data_gene_fix_chain_2D.py,
NUIGMech1.1 branch) on the available accelerator and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "traj/s/chip", "vs_baseline": N}

A "trajectory" is one full 800-segment case; the benchmark integrates
B cases x N_STEPS segments and normalizes (segments are homogeneous in cost,
so B*N_STEPS/800/elapsed is the steady-state throughput).

Baseline: the reference generates ground truth with CPU Cantera
(advance_to_steady_state per segment, BDF + dense LU on 924 species). On one
CPU core that is >= ~1 s/segment for NUIGMech1.1, i.e. <= 1/800 trajectories/s.
We use baseline = 1.25e-3 traj/s (800 s/case, a deliberately Cantera-friendly
single-core estimate; the reference's own runs also burn a time.sleep(1) per
case and a fresh YAML parse per worker, reference :48,57-67).

Env overrides: HEXPYRO_BENCH_B (cases), HEXPYRO_BENCH_STEPS (segments),
HEXPYRO_BENCH_MECH (mechanism name), HEXPYRO_BENCH_DTYPE (f64|f32).
"""

import json
import os
import sys
import time

CANTERA_BASELINE_TRAJ_PER_S = 1.25e-3


def run(B: int, n_steps: int, mech_name: str, dtype_name: str) -> dict:
    os.environ.setdefault("HEXPYRO_CACHE", "/root/.cache/hexpyro")
    import jax

    jax.config.update("jax_enable_x64", True)
    # TPU MXU f32 matmuls default to bf16 multi-pass; the kinetics log-space
    # activities need true f32 accumulation or residuals plateau above tol
    jax.config.update("jax_default_matmul_precision", "highest")
    cache_dir = "/root/.cache/jax_compile"
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import jax.numpy as jnp
    import numpy as np

    from hexpyro.mechanism import load_mechanism, to_device_arrays
    from hexpyro.reactors.pfr import simulate_pfr
    from hexpyro.sampling.lhs import sample_2d

    dtype = jnp.float32 if dtype_name == "f32" else jnp.float64

    mech = load_mechanism(
        f"/root/reference/DETAILED_KINETIC_MODEL/{mech_name}.yaml"
    )
    arr = to_device_arrays(mech, dtype=dtype)

    cases = sample_2d(n_samples=max(B, 8))[:B]
    T0 = jnp.asarray(cases[:, 0], dtype)
    P0 = jnp.asarray(cases[:, 1] * 1e5, dtype)

    # production-sized segments: dz = 1/800 m (a prefix of the real reactor),
    # so per-segment cost and continuation difficulty match the full sweep
    length = n_steps / 800.0
    fn = jax.jit(
        lambda T0, P0: simulate_pfr(
            arr, T0, P0, species_names=mech.species_names, n_steps=n_steps,
            length=length,
        )
    )
    # compile + warmup
    t0 = time.time()
    traj = jax.block_until_ready(fn(T0, P0))
    compile_s = time.time() - t0
    conv = bool(np.asarray(traj.converged).all())

    t0 = time.time()
    traj = jax.block_until_ready(fn(T0 + 0.5, P0))
    elapsed = time.time() - t0

    traj_per_s = B * (n_steps / 800.0) / elapsed
    return {
        "metric": "stiff PFR trajectories/sec per chip (NUIGMech1.1 2D LHS)",
        "value": round(traj_per_s, 5),
        "unit": "traj/s/chip",
        "vs_baseline": round(traj_per_s / CANTERA_BASELINE_TRAJ_PER_S, 2),
        "detail": {
            "mechanism": mech_name,
            "batch": B,
            "segments": n_steps,
            "elapsed_s": round(elapsed, 2),
            "compile_s": round(compile_s, 1),
            "converged": conv,
            "dtype": dtype_name,
            "device": str(jax.devices()[0]),
        },
    }


def main() -> None:
    mech_name = os.environ.get("HEXPYRO_BENCH_MECH", "NUIGMech1.1")
    # B=16 is NUIGMech1.1's measured throughput peak on one v5e chip with the
    # Newton-Schulz-preconditioned solver (0.43 traj/s; B=64 drops to 0.32)
    B = int(os.environ.get("HEXPYRO_BENCH_B", "16"))
    n_steps = int(os.environ.get("HEXPYRO_BENCH_STEPS", "800"))
    dtype_name = os.environ.get("HEXPYRO_BENCH_DTYPE", "f32")
    try:
        result = run(B, n_steps, mech_name, dtype_name)
    except Exception as e:  # TPU fault / OOM: retry once at a smaller config
        sys.stderr.write(f"bench retry after: {type(e).__name__}: {e}\n")
        result = run(max(B // 4, 4), max(n_steps // 2, 10), mech_name, dtype_name)
        result["detail"]["retried"] = True
    print(json.dumps(result))


if __name__ == "__main__":
    main()

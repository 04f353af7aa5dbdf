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


def measure_cpu_baseline(mech_name: str = "NUIGMech1.1", T0: float = 1050.0,
                         P0: float = 2.0e5) -> dict:
    """MEASURE the single-core CPU reference-equivalent throughput.

    Cantera is not installed in this image, so the reference's exact stack
    (CVODES BDF + dense LU per `advance_to_steady_state`, reference
    simul_data_gene_fix_chain_2D.py:154-160) cannot be timed directly. This
    measures the same computation with scipy's BDF (also a variable-order BDF
    with dense Newton/LU) on ONE pseudo-transient segment ODE, single thread,
    and extrapolates to 800 segments/trajectory. Deliberately
    Cantera-FRIENDLY: we hand scipy the analytic Jacobian (Cantera uses
    finite-difference Jacobians, ~ns extra RHS evals per refresh) and charge
    only one segment's integration-to-steady-state per segment.

    Run via HEXPYRO_BENCH_BASELINE=1 python bench.py.
    """
    # single-thread the whole stack: XLA's CPU eigen pool for the jitted
    # RHS/Jacobian evals, and the BLAS/LAPACK pools scipy's dense LU uses
    # (the reference pins workers to 1 thread the same way,
    # simul_data_gene_fix_chain_2D.py:12-16)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_cpu_multi_thread_eigen=false"
    ).strip()
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
                "NUMEXPR_NUM_THREADS"):
        os.environ[var] = "1"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    from scipy.integrate import solve_ivp

    from hexpyro.mechanism import load_mechanism, to_device_arrays
    from hexpyro.reactors.cstr import _jac_YY, _rhs_eoff
    from hexpyro.thermo import nasa7

    mech = load_mechanism(f"/root/reference/DETAILED_KINETIC_MODEL/{mech_name}.yaml")
    arr = to_device_arrays(mech, dtype=jnp.float64)
    Y_in = nasa7.mass_fractions_from_composition_string(
        "NC6H14:1.0, H2O:0.7", mech.species_names, mech.molecular_weights
    )
    Tj = jnp.asarray([T0])
    Pj = jnp.asarray([P0])
    Yj = jnp.asarray(Y_in)[None, :]
    rho0 = nasa7.density(Tj, Pj, Yj, arr.mw)
    dz = 1.0 / 800.0
    mdot_over_V = rho0 * 2.5 / dz  # reference geometry (L=1, u0=2.5)
    t_res = float((rho0 / mdot_over_V)[0])

    rhs_j = jax.jit(lambda Y: _rhs_eoff(Y, Tj, Pj, Yj, mdot_over_V, arr))
    jac_j = jax.jit(lambda Y: _jac_YY(Tj, Pj, Y, mdot_over_V, arr)[0])
    # pay jit compile OUTSIDE the timing (Cantera's C++ is precompiled)
    rhs_j(Yj).block_until_ready()
    jac_j(Yj).block_until_ready()

    def f(t, y):
        return np.asarray(rhs_j(jnp.asarray(y)[None, :]))[0]

    def jac(t, y):
        return np.asarray(jac_j(jnp.asarray(y)[None, :]))[0]

    t0 = time.time()
    sol = solve_ivp(
        f, (0.0, 50.0 * t_res), np.asarray(Y_in), method="BDF", jac=jac,
        rtol=1e-6, atol=1e-12,
    )
    seg_s = time.time() - t0
    return {
        "segment_seconds": seg_s,
        "traj_per_s": 1.0 / (800.0 * seg_s),
        "mechanism": mech_name,
        "solver": "scipy BDF, analytic Jacobian, 1 thread",
        "ivp_success": bool(sol.success),
        "nfev": int(sol.nfev),
        "njev": int(sol.njev),
    }


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

    # optional solver-option overrides for A/B perf experiments, e.g.
    # HEXPYRO_BENCH_OPTS='{"ns_precision": "highest", "jac_refresh_every": 3}'
    opts = None
    opts_json = os.environ.get("HEXPYRO_BENCH_OPTS")
    if opts_json:
        import dataclasses

        from hexpyro.reactors.cstr import default_steady_options

        opts = dataclasses.replace(
            default_steady_options(dtype), **json.loads(opts_json)
        )

    # production-sized segments: dz = 1/800 m (a prefix of the real reactor),
    # so per-segment cost and continuation difficulty match the full sweep
    length = n_steps / 800.0
    fn = jax.jit(
        lambda T0, P0: simulate_pfr(
            arr, T0, P0, species_names=mech.species_names, n_steps=n_steps,
            length=length, opts=opts,
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
    if os.environ.get("HEXPYRO_BENCH_BASELINE"):
        print(json.dumps(measure_cpu_baseline()))
        return
    mech_name = os.environ.get("HEXPYRO_BENCH_MECH", "NUIGMech1.1")
    # B=16 is NUIGMech1.1's measured throughput peak on one v5e chip with the
    # Newton-Schulz-preconditioned solver (3.0 traj/s with carry_jacobian,
    # 0.48 without; B=64 drops throughput)
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
